from tpurt.dist.failsafe import (
    Watchdog,
    WatchdogTimeout,
    call_with_retries,
    heartbeat,
    render_resumable,
)
from tpurt.dist.scene_shard import (
    prepare_scene_sharded,
    render_scene_sharded,
    render_scene_sharded_prepared,
    renumber_by_clusters,
)
from tpurt.dist.shard import make_mesh, render_sharded
from tpurt.dist.train import (make_ring_train_step, make_train_step, sgd_update)

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_scene_sharded",
    "render_scene_sharded_prepared",
    "prepare_scene_sharded",
    "renumber_by_clusters",
    "make_train_step",
    "make_ring_train_step",
    "sgd_update",
    "render_resumable",
    "heartbeat",
    "call_with_retries",
    "Watchdog",
    "WatchdogTimeout",
]
