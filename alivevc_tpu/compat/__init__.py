from alivevc_tpu.compat.torch_import import (
    load_torch_state_dict,
    import_content_encoder,
    import_f0_estimator,
    import_decoder,
    import_discriminator,
    import_voice_library,
)
from alivevc_tpu.compat.torch_export import (
    export_content_encoder,
    export_f0_estimator,
    export_decoder,
    export_voice_library,
    save_torch_state_dict,
)
