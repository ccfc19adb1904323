"""End-to-end workflow tests: dataset files -> CLI training -> relaxation.

Covers the reference's CLI workflows (scripts/load_mlearn_dataset.py) and the
relaxation capability (scripts/relax_org.py delegates to an external package;
ours is native) without any network access: a tiny mlearn-format dataset is
synthesized on the fly.
"""

import json
import sys

import numpy as np
import pytest

import jax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import graph_from_structure
from torch_m3gnet_tpu.data.io import load_mlearn_json, parse_cif
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.simulate import FireConfig, relax_structures


def _as_pymatgen_dict(s: Structure) -> dict:
    syms = {13: "Al", 29: "Cu", 11: "Na"}
    return {
        "lattice": {"matrix": s.lattice.tolist()},
        "sites": [
            {"abc": list(map(float, f)), "species": [{"element": syms[int(z)]}]}
            for f, z in zip(s.frac_coords, s.atomic_numbers)
        ],
    }


def _write_mlearn_dir(tmp_path, n_train=6, n_test=2):
    rng = np.random.default_rng(0)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )

    def records(n, seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            s = Structure(
                base.lattice,
                base.cart_coords + 0.06 * r.standard_normal((4, 3)),
                base.atomic_numbers,
            )
            out.append(
                {
                    "structure": _as_pymatgen_dict(s),
                    "outputs": {
                        "energy": float(-14.0 + 0.1 * r.standard_normal()),
                        "forces": (0.1 * r.standard_normal((4, 3))).tolist(),
                        "virial_stress": (r.standard_normal(6)).tolist(),
                    },
                }
            )
        return out

    d = tmp_path / "Cu"
    d.mkdir()
    (d / "training.json").write_text(json.dumps(records(n_train, 1)))
    (d / "test.json").write_text(json.dumps(records(n_test, 2)))
    return d


def test_mlearn_loader_roundtrip(tmp_path):
    d = _write_mlearn_dir(tmp_path)
    structs = load_mlearn_json(str(d / "training.json"))
    assert len(structs) == 6
    s = structs[0]
    assert len(s) == 4 and (s.atomic_numbers == 29).all()
    assert s.properties["forces"].shape == (4, 3)
    # kbar -> eV/A^3 and VASP -> Voigt reorder applied
    assert s.properties["stress"].shape == (6,)


def test_mlearn_stress_shear_order(tmp_path):
    """Pin the VASP->Voigt shear remap (data/io.py module docstring).

    The payload's virial_stress is VASP order [xx, yy, zz, xy, yz, zx]
    (load_mlearn_dataset.py:39-40); the model emits Voigt
    [xx, yy, zz, yz, zx, xy] (gradient.py:50-58 and our PotentialOutput). The
    default loader must place yz at slot 3, zx at 4, xy at 5. The reference's
    literal gather [0, 1, 2, 5, 3, 4] instead lands [zx, xy, yz] there — kept
    reproducible behind shear_order="reference"."""
    d = _write_mlearn_dir(tmp_path, n_train=1, n_test=1)
    rec = json.loads((d / "training.json").read_text())
    vasp = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # xx yy zz xy yz zx, kbar
    rec[0]["outputs"]["virial_stress"] = vasp
    (d / "training.json").write_text(json.dumps(rec))

    (s,) = load_mlearn_json(str(d / "training.json"))
    got = s.properties["stress"] * 1602.1766208
    np.testing.assert_allclose(got, [1, 2, 3, 5, 6, 4])  # xx yy zz yz zx xy

    (s_ref,) = load_mlearn_json(
        str(d / "training.json"), shear_order="reference"
    )
    got_ref = s_ref.properties["stress"] * 1602.1766208
    np.testing.assert_allclose(got_ref, [1, 2, 3, 6, 4, 5])  # shears permuted


def test_train_mlearn_cli(tmp_path, monkeypatch, capsys):
    d = _write_mlearn_dir(tmp_path)
    cfg = {
        "l_max": 2, "n_max": 2, "embedding_dim": 8, "num_blocks": 1,
        "batch_size": 4, "max_epochs": 3, "learning_rate": 1e-3,
        "early_stopping_patience": 100, "stress_weight": 0.0,
    }
    cfg_path = tmp_path / "cfg.yaml"
    import yaml

    cfg_path.write_text(yaml.safe_dump(cfg))

    from torch_m3gnet_tpu.cli import train_mlearn

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_mlearn",
            "--path", str(d),
            "--config", str(cfg_path),
            "--root", str(tmp_path / "run"),
            "--max-epochs", "3",
        ],
    )
    train_mlearn.main()
    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert "test" in result and np.isfinite(result["test"]["loss"])
    # logs + checkpoints written
    assert (tmp_path / "run" / "logs" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "checkpoints").exists()
    # dataset cache created and reusable
    assert any((tmp_path / "run" / "cache").iterdir())


def test_train_mlearn_cli_mesh(tmp_path, monkeypatch, capsys):
    """argv-level dp path: --mesh 2 trains over a 2-device mesh (virtual CPU
    devices from the conftest) end to end."""
    d = _write_mlearn_dir(tmp_path)
    cfg = {
        "l_max": 2, "n_max": 2, "embedding_dim": 8, "num_blocks": 1,
        "batch_size": 4, "max_epochs": 2, "learning_rate": 1e-3,
        "early_stopping_patience": 100, "stress_weight": 0.0,
    }
    cfg_path = tmp_path / "cfg.yaml"
    import yaml

    cfg_path.write_text(yaml.safe_dump(cfg))

    from torch_m3gnet_tpu.cli import train_mlearn

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_mlearn",
            "--path", str(d),
            "--config", str(cfg_path),
            "--root", str(tmp_path / "run"),
            "--mesh", "2",
        ],
    )
    train_mlearn.main()
    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert np.isfinite(result["test"]["loss"])


def test_cif_parser_roundtrip():
    cif = """
data_test
_cell_length_a 4.05
_cell_length_b 4.05
_cell_length_c 4.05
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_occupancy
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Al Al0 1.0 0.0 0.0 0.0
 Al Al1 1.0 0.5 0.5 0.0
 Al Al2 1.0 0.5 0.0 0.5
 Al Al3 1.0 0.0 0.5 0.5
"""
    s = parse_cif(cif)
    assert len(s) == 4
    np.testing.assert_allclose(s.lattice, np.eye(3) * 4.05, atol=1e-10)
    assert (s.atomic_numbers == 13).all()


def test_relaxation_reduces_forces():
    """FIRE on a rattled crystal must reduce the max force under the teacher
    potential (random weights give an arbitrary but smooth landscape)."""
    rng = np.random.default_rng(3)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    structures = [
        Structure(
            base.lattice,
            base.cart_coords + 0.15 * rng.standard_normal((4, 3)),
            base.atomic_numbers,
        )
        for _ in range(2)
    ]
    cfg = M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1)
    pot = build_model(cfg)
    from torch_m3gnet_tpu.data.graph import pack_structures

    g0 = pack_structures(structures, 4.5, 4.0)
    params = pot.init(jax.random.PRNGKey(7), g0)
    out0 = pot.apply(params, g0)
    fmax0 = float(np.linalg.norm(np.asarray(out0.forces), axis=1).max())

    relaxed, energies, fmax = relax_structures(
        pot, params, structures, 4.5, 4.0,
        FireConfig(max_steps=40, rebuild_every=20, fmax=1e-4),
    )
    assert np.isfinite(energies).all()
    assert fmax.max() < fmax0, (fmax, fmax0)


def test_train_model_data_parallel(tmp_path):
    """train_model with num_devices=2 runs the dp path end to end."""
    rng = np.random.default_rng(0)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    graphs = []
    for i in range(8):
        s = Structure(
            base.lattice,
            base.cart_coords + 0.05 * rng.standard_normal((4, 3)),
            base.atomic_numbers,
        )
        s.properties.update(
            energy=-14.0 + 0.05 * rng.standard_normal(),
            forces=0.05 * rng.standard_normal((4, 3)),
            stress=0.01 * rng.standard_normal(6),
        )
        graphs.append(graph_from_structure(s, 4.5, 4.0))

    from torch_m3gnet_tpu.train.run import train_model

    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        batch_size=4, num_devices=2, root=str(tmp_path),
        val_ratio=0.25, early_stopping_patience=100,
    )
    trainer, state, metrics = train_model(cfg, graphs, max_epochs=2)
    assert state.epoch == 2
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_cell_relaxation_reduces_stress():
    """relax_cell=True: the strain DOF inside the jitted FIRE loop drives a
    plane-strained fcc cell to sigma ~ 0 (measured: ~5e-10 eV/A^3)."""
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    F = np.diag([1.06, 0.95, 1.0])
    s0 = Structure(base.lattice @ F.T, base.cart_coords @ F.T, base.atomic_numbers)
    cfg = M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1)
    pot = build_model(cfg)
    from torch_m3gnet_tpu.data.graph import pack_structures

    g = pack_structures([s0], 4.5, 4.0)
    params = pot.init(jax.random.PRNGKey(7), g)
    out0 = pot.apply(params, g)
    e0 = float(out0.energy[0])
    st0 = float(np.abs(np.asarray(out0.stress)).max())

    relaxed, _, _ = relax_structures(
        pot, params, [s0], 4.5, 4.0,
        FireConfig(max_steps=400, rebuild_every=50, relax_cell=True,
                   fmax=1e-6, smax=1e-9, dt_max=2.0),
    )
    g1 = pack_structures(relaxed, 4.5, 4.0)
    out1 = pot.apply(params, g1)
    assert float(out1.energy[0]) <= e0 + 1e-6
    assert float(np.abs(np.asarray(out1.stress)).max()) < 0.05 * st0
    # lattice actually moved
    assert not np.allclose(relaxed[0].lattice, s0.lattice)


def test_lbfgs_relaxation_reduces_forces_and_stress():
    """Batched jitted L-BFGS: forces drop on a rattled crystal, and with
    relax_cell=True a plane-strained cell relaxes toward sigma = 0 (the cell
    strain is optimized INSIDE the jitted loop)."""
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.simulate import LbfgsConfig

    rng = np.random.default_rng(11)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    cfg = M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1)
    pot = build_model(cfg)

    # positions-only: max force must drop on two rattled copies
    structures = [
        Structure(
            base.lattice,
            base.cart_coords + 0.15 * rng.standard_normal((4, 3)),
            base.atomic_numbers,
        )
        for _ in range(2)
    ]
    g0 = pack_structures(structures, 4.5, 4.0)
    params = pot.init(jax.random.PRNGKey(7), g0)
    out0 = pot.apply(params, g0)
    fmax0 = float(np.linalg.norm(np.asarray(out0.forces), axis=1).max())
    relaxed, energies, fmax = relax_structures(
        pot, params, structures, 4.5, 4.0,
        LbfgsConfig(max_steps=40, rebuild_every=20, fmax=1e-4),
    )
    assert np.isfinite(energies).all()
    assert fmax.max() < fmax0, (fmax, fmax0)

    # plane strain + cell DOF: stress magnitude must drop, lattice must move
    F = np.diag([1.06, 0.95, 1.0])
    s0 = Structure(base.lattice @ F.T, base.cart_coords @ F.T, base.atomic_numbers)
    g = pack_structures([s0], 4.5, 4.0)
    st0 = float(np.abs(np.asarray(pot.apply(params, g).stress)).max())
    relaxed, _, _ = relax_structures(
        pot, params, [s0], 4.5, 4.0,
        LbfgsConfig(max_steps=60, rebuild_every=15, relax_cell=True,
                    fmax=1e-6, smax=1e-9),
    )
    g1 = pack_structures(relaxed, 4.5, 4.0)
    st1 = float(np.abs(np.asarray(pot.apply(params, g1).stress)).max())
    assert st1 < st0, (st1, st0)
    assert not np.allclose(relaxed[0].lattice, s0.lattice)


def test_predict_cli(tmp_path, monkeypatch, capsys):
    """predict CLI: structures JSON in -> E/F/S JSON out, physics sane."""
    a = 3.62
    structs = [
        {
            "lattice": (np.eye(3) * a).tolist(),
            "frac_coords": [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
            "atomic_numbers": [29, 29, 29, 29],
        }
    ]
    path = tmp_path / "structs.json"
    path.write_text(json.dumps(structs))

    cfg = {"l_max": 2, "n_max": 2, "embedding_dim": 8, "num_blocks": 1}
    cfg_path = tmp_path / "cfg.yaml"
    import yaml

    cfg_path.write_text(yaml.safe_dump(cfg))

    from torch_m3gnet_tpu.cli import predict

    monkeypatch.setattr(
        sys,
        "argv",
        ["predict", "--structures", str(path), "--config", str(cfg_path)],
    )
    predict.main()
    out = capsys.readouterr().out
    result = json.loads(out[out.index("["):])
    assert len(result) == 1
    r = result[0]
    assert r["num_atoms"] == 4 and len(r["forces"]) == 4
    # perfect fcc: forces vanish by symmetry, stress is isotropic
    assert np.abs(np.asarray(r["forces"])).max() < 1e-5
    s = np.asarray(r["stress_voigt"])
    np.testing.assert_allclose(s[0], s[1], atol=1e-6)
    np.testing.assert_allclose(s[3:], 0.0, atol=1e-6)
    assert np.isfinite(r["energy_per_atom"])
