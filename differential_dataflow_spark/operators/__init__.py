"""Operator kernels that need more than a single DataFrame combinator:
general grouped reduce (Arrow kernel), driver-side iteration, upsert
arrangement, and the micro-batch differential join/arrange machinery."""
