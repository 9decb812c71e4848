from neus2_tpu.ops import hashgrid, image, losses, neus_math, rotation, sh, warp  # noqa: F401
