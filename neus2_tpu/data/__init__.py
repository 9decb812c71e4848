from neus2_tpu.data import dataset, synthetic  # noqa: F401
