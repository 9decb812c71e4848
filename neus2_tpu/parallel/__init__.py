from neus2_tpu.parallel import train as ptrain  # noqa: F401
