from alivevc_tpu.io.audio import read_wav, write_wav, gain_db
from alivevc_tpu.io.dataset import WaveChunkDataset, batch_iterator
from alivevc_tpu.io.checkpoint import save_checkpoint, load_checkpoint
