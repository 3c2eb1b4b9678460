"""Sharded WFM pipeline — thin specialization of the mode-generic
parallel/radio_time.py (kept as the named flagship configuration:
time×channel sharded WFM broadcast stereo, BASELINE config 1/5)."""

from __future__ import annotations

from jax.sharding import Mesh

from ..models.radio import DEMOD_WFM
from .radio_time import ShardedRadioPipeline, TIME_AXIS, CH_AXIS


class ShardedWFMPipeline(ShardedRadioPipeline):
    def __init__(self, in_samplerate: float, mesh: Mesh, n_channels: int,
                 t_local: int, stereo: bool = True,
                 deemphasis: str = "50us"):
        super().__init__(in_samplerate, mesh, n_channels, t_local,
                         DEMOD_WFM, stereo=stereo, deemphasis=deemphasis)
