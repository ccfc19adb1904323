"""Training-dynamics parity vs the live torch reference (VERDICT r4 #1).

Round 4 pinned forward/E/F/S parity with mapped weights at machine epsilon
(tests/test_reference_parity.py); this pins the *optimization trajectories*:
from identical mapped init, the reference's own ``LitM3GNet._loss_fn`` +
``configure_optimizers`` (real torch Adam(eps=1e-7) + per-epoch
CosineAnnealingLR, /root/reference/src/torch_m3gnet/model/litmodule.py:123-183)
and our Trainer.train_step produce the same per-step losses and the same
parameters, full-batch on the committed synthetic-mlearn fixture at f64.

The recorded 60-step run (benchmarks/train_dynamics_r05.json) agrees at
~5e-16 per-step relative loss; the bounds below leave ~6 orders of headroom
so only a real divergence (loss weighting, optimizer math, schedule stepping,
stress convention) can trip them.
"""

from benchmarks.train_dynamics import run


def test_train_dynamics_parity():
    result = run(steps=8, verbose=False)
    assert result["first_step_loss_rel"] < 1e-12, result["first_step_loss_rel"]
    assert result["max_rel"]["loss"] < 1e-10, result["max_rel"]
    assert result["max_rel"]["energy_loss"] < 1e-10, result["max_rel"]
    assert result["max_rel"]["forces_loss"] < 1e-10, result["max_rel"]
    assert result["max_rel"]["stresses_loss"] < 1e-10, result["max_rel"]
    # torch's recursive CosineAnnealingLR == our closed form, step for step
    assert result["max_lr_closed_form_rel_err"] < 1e-12
    # the two stacks end at the same parameters
    assert result["final_param_max_rel"] < 1e-10, result["final_param_max_rel"]
    # and report the same held-out metrics
    ft = result["final_test"]
    for k in ("energy_mae", "forces_mae", "stresses_mae"):
        rel = abs(ft[f"{k}_ref"] - ft[f"{k}_ours"]) / max(abs(ft[f"{k}_ref"]), 1e-300)
        assert rel < 1e-9, (k, ft)
