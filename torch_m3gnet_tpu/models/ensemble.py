"""Committee (deep-ensemble) evaluation: one vmapped forward, K parameter sets.

Standard MLIP workflow the reference has no counterpart for: train K
potentials (different seeds/splits), stack their parameter trees, and get
mean predictions + committee disagreement — the usual active-learning /
uncertainty signal — from a single jitted, vmapped evaluation (the batch is
broadcast; only parameters carry the ensemble axis, so XLA shares all
graph-construction work and batches the matmuls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_params(param_trees):
    """Stack K identical-structure parameter trees along a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


class EnsemblePotential:
    """K-member committee over one :class:`M3GNetPotential` architecture.

    ``apply(stacked_params, batch)`` returns
    ``(mean: PotentialOutput, std: PotentialOutput)`` — elementwise committee
    mean and (population) standard deviation of energy/forces/stress/...
    Padded entries stay zero in both.
    """

    def __init__(self, potential):
        self.potential = potential

        def member(params, batch):
            return self.potential._apply(params, batch)

        def run(stacked_params, batch):
            outs = jax.vmap(member, in_axes=(0, None))(stacked_params, batch)
            mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), outs)
            std = jax.tree.map(lambda x: jnp.std(x, axis=0), outs)
            return mean, std

        self._japply = jax.jit(run)

    def apply(self, stacked_params, batch):
        return self._japply(stacked_params, batch)
