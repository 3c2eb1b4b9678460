"""Multi-chip sharding for the SDR pipelines.

The reference scales by threads on one host plus an optional TCP server
(reference: core/src/dsp/block.h, core/src/server.cpp).  Here scaling is a
``jax.sharding.Mesh`` with two named axes:

  * ``"ch"``  — VFO-channel data parallelism: each device demodulates a
    slice of the batched channel axis (the analog of the reference running
    N VFO thread-chains off one Splitter,
    reference: core/src/routing/splitter.h:59-92).
  * ``"time"`` — sequence parallelism over the sample axis: each device
    processes a contiguous time segment, exchanging overlap-save tails
    ("halos") with its left neighbour over ICI via ``lax.ppermute`` —
    the distributed form of the taps-1 history every reference FIR carries
    across block boundaries (reference: core/src/dsp/filter/fir.h:84-86).

First-order IIR carries (de-emphasis, DC blocker) are time-sharded exactly
with a two-level associative scan: per-shard affine composition locally,
then an O(log n)-device exclusive scan of 2-scalar affine maps.
"""

from .halo import left_halo, shard_offset
from .dist_scan import dist_affine_carry, sharded_linear_recurrence
from .channel import channel_specs, channel_sharded_fn
from .wfm_time import ShardedWFMPipeline
from .radio_time import ShardedRadioPipeline
from .multihost import (initialize_distributed, make_mesh,
                        feed_time_sharded, host_local_slice)

__all__ = [
    "left_halo", "shard_offset", "dist_affine_carry",
    "sharded_linear_recurrence", "channel_specs", "channel_sharded_fn",
    "ShardedWFMPipeline", "ShardedRadioPipeline",
    "initialize_distributed", "make_mesh",
    "feed_time_sharded", "host_local_slice",
]
