from genomad_tpu.parallel import mesh  # noqa: F401
