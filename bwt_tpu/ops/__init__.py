"""Device-side compute primitives (suffix sort, rank, search, DP kernels)."""
