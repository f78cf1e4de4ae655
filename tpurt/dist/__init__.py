from tpurt.dist.failsafe import (
    Watchdog,
    WatchdogTimeout,
    call_with_retries,
    heartbeat,
    render_resumable,
)
from tpurt.dist.scene_shard import render_scene_sharded
from tpurt.dist.shard import make_mesh, render_sharded
from tpurt.dist.train import make_train_step, sgd_update

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_scene_sharded",
    "make_train_step",
    "sgd_update",
    "render_resumable",
    "heartbeat",
    "call_with_retries",
    "Watchdog",
    "WatchdogTimeout",
]
