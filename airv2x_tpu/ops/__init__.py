"""Device ops: pure-JAX / Pallas building blocks for the perception stack.

Everything in this package is shape-static and jit-compatible. Ragged data is
carried as (fixed-capacity array, mask) pairs.
"""
