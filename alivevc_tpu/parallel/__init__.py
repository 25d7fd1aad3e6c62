from alivevc_tpu.parallel.mesh import make_mesh, replicate, shard_along
from alivevc_tpu.parallel.sharded_knn import (
    sharded_match_features,
    pad_library_for_sharding,
)
from alivevc_tpu.parallel.halo import (
    sharded_frame_model,
    content_encoder_sharded,
    f0_estimator_sharded,
)
