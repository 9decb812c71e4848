from neus2_tpu.models import delta, field, mlp  # noqa: F401
