from deft_tpu.models.factory import create_model, init_model  # noqa: F401
