# Pallas-TPU (Mosaic) kernels. Each kernel ships with a jnp reference twin
# used for testing and as a fallback on non-TPU backends.
