from super_tpu.data import synthetic  # noqa: F401
