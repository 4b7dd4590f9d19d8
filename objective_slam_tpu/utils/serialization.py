"""Model-description serialization — the checkpoint/resume subsystem.

The reference has no checkpointing (SURVEY.md §5): it rebuilds the model
hash table from scratch for every (scene, model) pair and acknowledges the
waste (ppf.cu:64-67). Here the ModelDescription is an explicit artifact:
build once offline, save to one .npz, load anywhere (including hosts
without the original PLY).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from objective_slam_tpu.models import drost
from objective_slam_tpu.ops import hashing, voting, voting_corr, voting_fast

_FORMAT_VERSION = 3


def save_model_description(path, desc: drost.ModelDescription) -> None:
    """Write a ModelDescription to an .npz file (fast/correlation tables are
    rebuilt on load — both are pure re-layouts of the key table)."""
    meta = {
        "format_version": _FORMAT_VERSION,
        "n_points": desc.n_points,
        "num_keys": desc.num_keys,
        "max_dist_bin": desc.max_dist_bin,
        "diameter": desc.diameter,
        "has_fast_tables": desc.fast_tables is not None,
        "has_corr_tables": desc.corr_tables is not None,
        "corr_n_angle": (desc.corr_tables.n_angle
                         if desc.corr_tables is not None else None),
        "fnv_k_occ": (desc.fnv_remap.k_occ
                      if desc.fnv_remap is not None else None),
    }
    extra = {}
    if desc.fnv_remap is not None:
        extra["fnv_occ_hashes"] = np.asarray(desc.fnv_remap.occ_hashes)
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **extra,
        points=np.asarray(desc.points),
        normals=np.asarray(desc.normals),
        beta=np.asarray(desc.beta),
        gamma=np.asarray(desc.gamma),
        vote_weights=np.asarray(desc.vote_weights),
        d_dist=np.asarray(desc.d_dist),
        counts=np.asarray(desc.table.counts),
        offsets=np.asarray(desc.table.offsets),
        pair_mr=np.asarray(desc.table.pair_mr),
        pair_alpha=np.asarray(desc.table.pair_alpha),
        max_count=np.asarray(desc.table.max_count),
    )


def load_model_description(path) -> drost.ModelDescription:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if meta["format_version"] not in (1, 2, _FORMAT_VERSION):
            raise ValueError(
                f"unsupported model description version "
                f"{meta['format_version']}")
        table = voting.KeyTable(
            counts=jnp.asarray(z["counts"]),
            offsets=jnp.asarray(z["offsets"]),
            pair_mr=jnp.asarray(z["pair_mr"]),
            pair_alpha=jnp.asarray(z["pair_alpha"]),
            max_count=jnp.asarray(z["max_count"]),
        )
        fast_tables = (voting_fast.build_fast_tables(table)
                       if meta["has_fast_tables"] else None)
        # Rebuild correlation tables when the saved model carried them
        # (format v2+); like fast_tables they are a pure re-layout of the
        # key table, so a loaded model runs every engine it was built for.
        corr_tables = None
        if meta.get("has_corr_tables", False):
            corr_tables = voting_corr.build_corr_tables(
                table, int(meta["n_points"]),
                n_angle=int(meta["corr_n_angle"]))
        fnv_remap = None
        if meta.get("fnv_k_occ") is not None:
            fnv_remap = hashing.FnvRemap(
                occ_hashes=jnp.asarray(z["fnv_occ_hashes"]),
                k_occ=int(meta["fnv_k_occ"]))
        return drost.ModelDescription(
            points=jnp.asarray(z["points"]),
            normals=jnp.asarray(z["normals"]),
            beta=jnp.asarray(z["beta"]),
            gamma=jnp.asarray(z["gamma"]),
            vote_weights=jnp.asarray(z["vote_weights"]),
            table=table,
            d_dist=jnp.asarray(z["d_dist"]),
            fast_tables=fast_tables, corr_tables=corr_tables,
            fnv_remap=fnv_remap,
            n_points=int(meta["n_points"]),
            num_keys=int(meta["num_keys"]),
            max_dist_bin=int(meta["max_dist_bin"]),
            diameter=float(meta["diameter"]),
        )
