"""On-device (JAX) computational kernels: samplers, integrator, surface
interaction, histograms, and line-of-sight reductions."""
