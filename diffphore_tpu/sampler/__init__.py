"""Reverse-diffusion sampling: pose randomization + the jitted Euler-Maruyama
scan over T(3) x SO(3) x SO(2)^m."""

from .sampling import randomize_position, reverse_diffusion, sample_step  # noqa: F401
