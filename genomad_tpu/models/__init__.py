from genomad_tpu.models import igloo  # noqa: F401
