from iprgan_tpu.parallel.mesh import ParallelContext  # noqa: F401
