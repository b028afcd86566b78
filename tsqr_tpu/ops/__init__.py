from tsqr_tpu.ops import householder  # noqa: F401
