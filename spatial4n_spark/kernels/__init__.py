"""Pure NumPy geometry kernels. No Spark imports allowed here.

Every kernel is vectorized: inputs are scalars or ndarrays, outputs are
ndarrays. Semantics match the Spatial4n reference bit-for-bit where the
reference has test vectors (see tests/).
"""
