from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
from alivevc_tpu.models.f0_estimator import (
    f0_estimator,
    f0_estimate,
    init_f0_estimator,
)
from alivevc_tpu.models.decoder import decoder, init_decoder
from alivevc_tpu.models.voice_library import (
    init_voice_library,
    voice_library_match,
)
from alivevc_tpu.models.discriminator import (
    init_discriminator,
    discriminator_logits,
    discriminator_feat_loss,
)
