"""Physics kernels: cross sections, samplers, emissivities, FP coefficients."""
