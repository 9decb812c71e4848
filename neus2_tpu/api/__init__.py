from neus2_tpu.api.testbed import Testbed  # noqa: F401
