"""Geometric math kernels: irreps algebra, spherical harmonics, rigid/torsion
updates, SO(3)/torus diffusion tables. Pure JAX (device) + numpy (table build).
"""
