from alivevc_tpu.compat.torch_import import (
    load_torch_state_dict,
    import_content_encoder,
    import_f0_estimator,
    import_decoder,
    import_discriminator,
    import_voice_library,
)
