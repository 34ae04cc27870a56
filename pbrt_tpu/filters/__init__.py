from pbrt_tpu.filters import filters  # noqa: F401
