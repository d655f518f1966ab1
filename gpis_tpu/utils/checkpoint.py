"""Checkpoint / resume (SURVEY.md §6: the reference has none — its model
dies with the node; the rebuild saves model state after every refit so
recovery = reload + replay pending touches).

NPZ format: all GPModel leaves plus static metadata. The Cholesky factor is
included by default (fast resume, larger file) or recomputed on load with
`save(..., factor=False)`.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from gpis_tpu.gp.model import GPModel

__all__ = ["save_model", "load_model"]

_FORMAT_VERSION = 1


def save_model(path: str, model, *, factor: bool = True) -> None:
    """Save a GPModel, DerivGPModel (joint normals), ShardedGPModel, or
    OOCModel (W panels land beside the npz in `path + ".w/"`)."""
    from gpis_tpu.gp.kinds import model_kind

    kind = model_kind(model)
    if kind in ("ooc", "ooc_joint"):
        _save_ooc(path, model)
        return
    if kind in ("sharded", "sharded_joint"):
        _save_sharded(path, model)
        return
    if kind == "experts":
        _save_experts(path, model, factor=factor)
        return
    joint = kind == "joint"
    meta = {
        "format": _FORMAT_VERSION,
        "kernel": model.kernel,
        "n0": model.n0,
        "dtype": str(np.dtype(model.dtype)),
        "has_factor": bool(factor),
        "joint": joint,
    }
    if not joint:
        meta["pad_noise"] = float(model.pad_noise)
    arrays = {
        "x": np.asarray(model.x),
        "y": np.asarray(model.y),
        "alpha": np.asarray(model.alpha),
        "param_lengthscale": np.asarray(model.params["lengthscale"]),
        "param_signal_variance": np.asarray(model.params["signal_variance"]),
    }
    if joint:
        arrays["normals"] = np.asarray(model.normals)
        arrays["noise_f"] = np.asarray(model.noise_f)
        arrays["noise_g"] = np.asarray(model.noise_g)
        if getattr(model, "linv", None) is not None:
            meta["has_linv"] = True
            arrays["linv"] = np.asarray(model.linv)
        if getattr(model, "touch_x", None) is not None:
            meta["joint_touch"] = True
            meta["n_touch"] = int(model.n_touch)
            arrays["touch_x"] = np.asarray(model.touch_x)
            arrays["touch_y"] = np.asarray(model.touch_y)
            arrays["touch_noise"] = np.asarray(model.touch_noise)
    else:
        arrays["noise"] = np.asarray(model.noise)
        arrays["n_touch"] = np.asarray(model.n_touch)
        # Persist the fast-query factor so loaded sessions answer queries
        # identically to the saved one.  fit_inference models alias
        # chol == W: store it once.
        linv = getattr(model, "linv", None)
        if linv is not None:
            if linv is model.chol:
                meta["linv_is_chol"] = True
            else:
                meta["has_linv"] = True
                arrays["linv"] = np.asarray(linv)
    if factor:
        arrays["chol"] = np.asarray(model.chol)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


_OOC_TAIL_KEYS = ("tail_x", "tail_y", "tail_noise", "tail_v", "tail_a",
                  "tail_chol", "tail_alpha")


def _save_ooc(path: str, model) -> None:
    """Out-of-core checkpoint: the replicated small state (x/y/noise/
    alpha/u + touch tail) in the npz, the W = L^{-1} panels as raw files
    under `path + ".w/"` in the panel-store manifest format — panels are
    written AT THEIR STORED DTYPE (a spill-compressed f16 panel stays f16;
    the manifest records per-panel dtypes and fetches widen back), and a
    disk-tier panel is copied straight from its backing file without a
    device round-trip."""
    import os

    from gpis_tpu.linalg import outofcore as ooc

    wdir = path + ".w"
    os.makedirs(wdir, exist_ok=True)
    # alpha's length is the factor size for both layouts (C value, 4C joint).
    nb = model.alpha.shape[0] // model.panel
    # Delegate the on-disk format to the panel store itself (a zero-budget
    # store routes every put to the disk tier): panel naming, per-panel
    # dtype metadata, and the atomic manifest replace live in ONE place —
    # TieredPanelStore — so checkpoints stay readable by open_dir whatever
    # the store format grows next.
    out = ooc.TieredPanelStore(ooc.DeviceBudget(0), spill_dir=wdir)
    for j in range(nb):
        v = model.wstore.get(j)
        if isinstance(v, ooc._DiskPanel):
            v = v.read()
        # MATERIALIZED copy, not a view: when a restored model is saved
        # back to its own path, the source file IS the target file —
        # put_host's 'w+' memmap truncates it, and a no-copy view of the
        # old mapping would then read back zeros (silently destroying both
        # the checkpoint and the live model's W).
        out.put_host(j, np.array(v))  # written at the STORED dtype
    out.compute_dtype = model.dtype
    out.save_manifest()

    meta = {
        "format": _FORMAT_VERSION,
        "kernel": model.kernel,
        "dtype": str(np.dtype(model.dtype)),
        "ooc": True,
        "panel": int(model.panel),
        "n_real": int(model.n_real),
        "n_tail": int(model.n_tail),
        "has_u": model.u is not None,
        "logdiag_sum": model.logdiag_sum,
    }
    arrays = {
        "x": np.asarray(model.x),
        "y": np.asarray(model.y),
        "noise": np.asarray(model.noise),
        "alpha": np.asarray(model.alpha),
        "param_lengthscale": np.asarray(model.params["lengthscale"]),
        "param_signal_variance": np.asarray(model.params["signal_variance"]),
    }
    if model.u is not None:
        arrays["u"] = np.asarray(model.u)
    if model.n_tail:
        arrays["alpha0"] = np.asarray(model.alpha0)
        for k in _OOC_TAIL_KEYS:
            arrays[k] = np.asarray(getattr(model, k))
    if getattr(model, "meta", None) is not None:
        # Joint OOC model: normals/noise_g round-trip; the packed (J, 7)
        # factor metadata is reconstructed from x at load (joint_meta is
        # deterministic given the padded core coordinates).
        meta["joint"] = True
        arrays["normals"] = np.asarray(model.normals)
        arrays["noise_g"] = np.asarray(model.noise_g)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _load_ooc(d, meta, path: str):
    from gpis_tpu.linalg import outofcore as ooc

    panel = int(meta["panel"])
    j_tot = d["alpha"].shape[0]  # factor size for both layouts
    budget = ooc.DeviceBudget(
        ooc._hbm_budget(panel, j_tot, d["x"].dtype.itemsize))
    wstore = ooc.TieredPanelStore.open_dir(budget, path + ".w")
    tail = {}
    if meta.get("n_tail"):
        tail = {k: jnp.asarray(d[k]) for k in _OOC_TAIL_KEYS}
        tail["alpha0"] = jnp.asarray(d["alpha0"])
    common = dict(
        kernel=meta["kernel"],
        x=jnp.asarray(d["x"]), y=jnp.asarray(d["y"]),
        noise=jnp.asarray(d["noise"]), alpha=jnp.asarray(d["alpha"]),
        params={"lengthscale": jnp.asarray(d["param_lengthscale"]),
                "signal_variance": jnp.asarray(d["param_signal_variance"])},
        wstore=wstore, panel=panel, n_real=int(meta["n_real"]),
        u=jnp.asarray(d["u"]) if meta.get("has_u") else None,
        logdiag_sum=meta.get("logdiag_sum"),
        n_tail=int(meta.get("n_tail", 0)), **tail,
    )
    if meta.get("joint"):
        from gpis_tpu.kernels import pallas_joint as pj

        xp = common["x"]
        coords, dirs, flag = pj.joint_meta(xp)
        return ooc.OOCJointModel(
            meta=jnp.concatenate([coords, dirs, flag[:, None]], axis=1),
            normals=jnp.asarray(d["normals"]),
            noise_g=jnp.asarray(d["noise_g"]),
            n0=xp.shape[0], **common,
        )
    return ooc.OOCModel(**common)


def _save_experts(path: str, model, *, factor: bool = True) -> None:
    """Expert committee: all stacked (E, …) leaves round-trip; W factors
    are stored when present (they alias nothing, unlike fit_inference)."""
    meta = {
        "format": _FORMAT_VERSION,
        "kernel": model.kernel,
        "n0": model.n0,
        "dtype": str(np.dtype(model.dtype)),
        "experts": True,
        "pad_noise": float(model.pad_noise),
        "beta": model.beta,
        "gate": int(model.gate),
        "has_factor": bool(factor),
        "has_linv": bool(factor) and model.linv is not None,
        # Large committees drop the stacked L (gp.experts retain_chol) —
        # queries need only W; touch updates refactor one expert on demand.
        "has_chol": bool(factor) and model.chol is not None,
    }
    arrays = {
        "x": np.asarray(model.x),
        "y": np.asarray(model.y),
        "noise": np.asarray(model.noise),
        "alpha": np.asarray(model.alpha),
        "n_touch": np.asarray(model.n_touch),
        "centroids": np.asarray(model.centroids),
        "param_lengthscale": np.asarray(model.params["lengthscale"]),
        "param_signal_variance": np.asarray(model.params["signal_variance"]),
    }
    if model.normals is not None:
        meta["experts_joint"] = True
        arrays["normals"] = np.asarray(model.normals)
        arrays["noise_g"] = np.asarray(model.noise_g)
        if model.touch_x is not None:
            arrays["touch_x"] = np.asarray(model.touch_x)
            arrays["touch_y"] = np.asarray(model.touch_y)
            arrays["touch_noise"] = np.asarray(model.touch_noise)
    if factor:
        if model.chol is not None:
            arrays["chol"] = np.asarray(model.chol)
        if model.linv is not None:
            arrays["linv"] = np.asarray(model.linv)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _load_experts(d, meta):
    from gpis_tpu.gp.experts import ExpertGPModel

    params = {
        "lengthscale": jnp.asarray(d["param_lengthscale"]),
        "signal_variance": jnp.asarray(d["param_signal_variance"]),
    }
    x = jnp.asarray(d["x"])
    joint = bool(meta.get("experts_joint"))
    extra = {}
    if joint:
        extra = {"normals": jnp.asarray(d["normals"]),
                 "noise_g": jnp.asarray(d["noise_g"])}
        for k in ("touch_x", "touch_y", "touch_noise"):
            if k in d:
                extra[k] = jnp.asarray(d[k])
    if meta["has_factor"]:
        # Pre-r4 checkpoints always stored chol; retain_chol=False ones
        # carry W only (chol stays None — expert_chol refactors on demand).
        chol = (jnp.asarray(d["chol"])
                if meta.get("has_chol", True) and "chol" in d else None)
        m0 = None
    else:
        chol, m0 = None, "recompute"
    m = ExpertGPModel(
        x=x, y=jnp.asarray(d["y"]), noise=jnp.asarray(d["noise"]),
        params=params, chol=chol, alpha=jnp.asarray(d["alpha"]),
        linv=jnp.asarray(d["linv"]) if meta.get("has_linv") else None,
        n_touch=jnp.asarray(d["n_touch"]),
        centroids=jnp.asarray(d["centroids"]),
        kernel=meta["kernel"], n0=int(meta["n0"]),
        pad_noise=float(meta["pad_noise"]),
        beta=meta["beta"], gate=int(meta["gate"]), **extra,
    )
    if m0 is not None:
        # Factor-less checkpoint: refactor every expert (value or joint —
        # expert_chol owns both gram layouts).
        import dataclasses as _dc

        from gpis_tpu.gp.experts import expert_chol

        m = _dc.replace(m, chol=jnp.stack([
            expert_chol(m, e) for e in range(x.shape[0])
        ]))
    return m


def _save_sharded(path: str, model) -> None:
    joint = getattr(model, "normals", None) is not None
    meta = {
        "format": _FORMAT_VERSION,
        "kernel": model.kernel,
        "n0": model.n0,
        "dtype": str(np.dtype(model.dtype)),
        "sharded": True,
        "joint": joint,
        "n_devices": int(model.mesh.shape["row"]),
        "block": int(model.block),
        "n_touch": int(model.n_touch),
        "n_real": int(model.n_real),
    }
    arrays = dict(
        x=np.asarray(model.x), y=np.asarray(model.y),
        l=np.asarray(model.l), w=np.asarray(model.w), alpha=np.asarray(model.alpha),
        param_lengthscale=np.asarray(model.params["lengthscale"]),
        param_signal_variance=np.asarray(model.params["signal_variance"]),
    )
    if joint:
        meta["pad_noise"] = float(model.pad_noise)
        arrays["normals"] = np.asarray(model.normals)
        arrays["noise_f"] = np.asarray(model.noise_f)
        arrays["noise_g"] = np.asarray(model.noise_g)
    else:
        arrays["noise"] = np.asarray(model.noise)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _load_sharded(d, meta):
    import jax

    from gpis_tpu.gp.sharded_model import ShardedGPModel
    from gpis_tpu.parallel import mesh as pm

    n = meta["n_devices"]
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"checkpoint was fit on {n} devices; only {len(jax.devices())} visible"
        )
    mesh = pm.make_row_mesh(n)
    rs = pm.row_sharding(mesh)
    params = {
        "lengthscale": jnp.asarray(d["param_lengthscale"]),
        "signal_variance": jnp.asarray(d["param_signal_variance"]),
    }
    if meta.get("joint"):
        from gpis_tpu.gp.sharded_joint import ShardedJointModel

        return ShardedJointModel(
            kernel=meta["kernel"], x=jnp.asarray(d["x"]), params=params,
            l=jax.device_put(jnp.asarray(d["l"]), rs),
            w=jax.device_put(jnp.asarray(d["w"]), rs),
            alpha=jnp.asarray(d["alpha"]),
            mesh=mesh, block=meta["block"], n0=int(meta["n0"]),
            normals=jnp.asarray(d["normals"]), y=jnp.asarray(d["y"]),
            noise_f=jnp.asarray(d["noise_f"]), noise_g=jnp.asarray(d["noise_g"]),
            n_touch=int(meta.get("n_touch", 0)), n_real=int(meta.get("n_real", 0)),
            pad_noise=float(meta.get("pad_noise", 1e10)),
        )
    return ShardedGPModel(
        kernel=meta["kernel"], x=jnp.asarray(d["x"]), y=jnp.asarray(d["y"]),
        noise=jnp.asarray(d["noise"]),
        params=params,
        l=jax.device_put(jnp.asarray(d["l"]), rs),
        w=jax.device_put(jnp.asarray(d["w"]), rs),
        alpha=jnp.asarray(d["alpha"]),
        mesh=mesh, block=meta["block"], n0=int(meta["n0"]),
        n_touch=int(meta.get("n_touch", 0)), n_real=int(meta.get("n_real", 0)),
    )


def load_model(path: str):
    d = np.load(path, allow_pickle=False)
    meta = json.loads(str(d["meta"]))
    if meta["format"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format {meta['format']}")
    if meta.get("ooc"):
        return _load_ooc(d, meta, path)
    if meta.get("sharded"):
        return _load_sharded(d, meta)
    if meta.get("experts"):
        return _load_experts(d, meta)
    params = {
        "lengthscale": jnp.asarray(d["param_lengthscale"]),
        "signal_variance": jnp.asarray(d["param_signal_variance"]),
    }
    x = jnp.asarray(d["x"])
    if meta.get("joint"):
        from gpis_tpu.gp.derivative import DerivGPModel
        from gpis_tpu.kernels import derivative as kd
        from gpis_tpu.linalg import cholesky as lin

        if meta["has_factor"]:
            chol = jnp.asarray(d["chol"])
        else:
            chol = lin.cholesky(kd.joint_gram(
                meta["kernel"], x, params,
                noise_f=jnp.asarray(d["noise_f"]), noise_g=jnp.asarray(d["noise_g"]),
            ))
        touch = {}
        if meta.get("joint_touch"):
            touch = dict(
                touch_x=jnp.asarray(d["touch_x"]),
                touch_y=jnp.asarray(d["touch_y"]),
                touch_noise=jnp.asarray(d["touch_noise"]),
                n_touch=jnp.asarray(meta["n_touch"], jnp.int32),
            )
        return DerivGPModel(
            x=x, y=jnp.asarray(d["y"]), normals=jnp.asarray(d["normals"]),
            noise_f=jnp.asarray(d["noise_f"]), noise_g=jnp.asarray(d["noise_g"]),
            params=params, chol=chol, alpha=jnp.asarray(d["alpha"]),
            kernel=meta["kernel"], n0=int(meta["n0"]),
            linv=jnp.asarray(d["linv"]) if meta.get("has_linv") else None,
            **touch,
        )
    if meta["has_factor"]:
        chol = jnp.asarray(d["chol"])
    else:
        from gpis_tpu.kernels import gram as kg
        from gpis_tpu.linalg import cholesky as lin

        chol = lin.cholesky(kg.gram(meta["kernel"], x, params, noise=jnp.asarray(d["noise"])))
    linv = None
    if meta.get("linv_is_chol"):
        linv = chol
    elif meta.get("has_linv"):
        linv = jnp.asarray(d["linv"])
    return GPModel(
        x=x,
        y=jnp.asarray(d["y"]),
        noise=jnp.asarray(d["noise"]),
        params=params,
        chol=chol,
        alpha=jnp.asarray(d["alpha"]),
        n_touch=jnp.asarray(d["n_touch"]),
        kernel=meta["kernel"],
        n0=int(meta["n0"]),
        pad_noise=float(meta.get("pad_noise", 1e10)),
        linv=linv,
    )
