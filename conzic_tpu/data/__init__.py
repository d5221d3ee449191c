from conzic_tpu.data import synthetic  # noqa: F401
