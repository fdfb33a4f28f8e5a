from multimodal_auv_tpu.utils.devices import (  # noqa: F401
    check_model_devices,
    get_available_devices,
    setup_environment_and_devices,
)
from multimodal_auv_tpu.utils.logging_utils import setup_pipeline_logging  # noqa: F401
from multimodal_auv_tpu.utils.tb import SummaryWriter  # noqa: F401
