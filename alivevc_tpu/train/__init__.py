from alivevc_tpu.train.losses import (
    cut_center,
    mel_l1_loss,
    generator_adv_loss,
    discriminator_adv_loss,
    f0_cross_entropy,
)
from alivevc_tpu.train.optim import cosine_annealing, adamw_gan, radam
from alivevc_tpu.train.distill import DistillState, init_distill, distill_step
from alivevc_tpu.train.f0 import F0TrainState, init_f0_train, f0_train_step
from alivevc_tpu.train.gan import GanState, init_gan, gan_train_step
from alivevc_tpu.train.fine_tune import (
    FineTuneState,
    init_fine_tune,
    fine_tune_step,
)
from alivevc_tpu.train.library_gen import generate_voice_library
