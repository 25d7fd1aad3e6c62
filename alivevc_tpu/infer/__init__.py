from alivevc_tpu.infer.offline import OfflineConverter, convert_window
from alivevc_tpu.infer.streaming import StreamingConverter, streaming_step
