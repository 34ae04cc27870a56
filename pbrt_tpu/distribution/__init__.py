from pbrt_tpu.distribution import distributions  # noqa: F401
