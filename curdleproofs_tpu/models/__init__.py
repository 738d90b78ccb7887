from curdleproofs_tpu.models import api  # noqa: F401
