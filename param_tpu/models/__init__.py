from param_tpu.models.dlrm import DlrmConfig, DlrmModel  # noqa: F401
