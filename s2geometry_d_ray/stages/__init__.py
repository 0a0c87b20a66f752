"""map_batches kernels: stateless functions + actor-pool classes."""
