"""Ray Data stage library: batch kernels, actor-pool stages, joins."""
