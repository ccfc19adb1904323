"""Device-mesh helpers.

The reference has no distributed support at all (single device, devices=1 at
/root/reference/src/torch_m3gnet/model/litmodule.py:269,291). Here scaling is a
first-class design: a ``jax.sharding.Mesh`` with a ``dp`` axis for
graph-batch data parallelism (gradients all-reduced over ICI) and room for a
``gp`` (graph-partition) axis for edge/triplet sharding of huge graphs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "dp",
    platform: Optional[str] = None,
) -> Mesh:
    """Build a 1-D mesh over available devices.

    Args:
        n_devices: number of devices (default: all of the chosen platform).
        platform: "cpu" to force the virtual CPU devices (tests/dry runs),
            None for the default accelerator.
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices and platform is None:
            # fall back to the (possibly virtual) CPU devices — used by tests
            # and multichip dry runs on single-accelerator hosts
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= n_devices:
                devices = cpus
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:3]]}...)"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
