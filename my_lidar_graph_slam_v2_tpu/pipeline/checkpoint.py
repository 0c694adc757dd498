"""Checkpoint / resume.

The reference persists only at end-of-run (pose-graph JSON + maps,
``map_saver.cpp:205-265``); SURVEY.md section 5.4 identifies the
pose-graph JSON (plus raw scan buffers) as the natural mid-run checkpoint
format.  This module implements exactly that for multi-host/long runs:

* ``save``: pose graph JSON + held scan buffers (npz) + held local-map
  log-odds rasters (npz) + builder counters.
* ``load``: restore the saved rasters directly; any local map without a
  saved raster is re-rasterized from its scans via the invariant
  map-local poses (``grid_map_builder.cpp:440-449``) when they are held,
  and restored as a dropped (pose/metadata-only) map otherwise.

Owner-sharded runs (parallel/multihost.py Stage 5b): each process calls
``save`` with a rank-suffixed prefix and writes only the heavy state it
still holds, so checkpoint size ALSO scales ~1/P; ``load`` reproduces
exactly the state the retention policy left.  The union of all per-rank
checkpoints is the full run state.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..core import pose as P
from ..grid.builder import GridMapBuilder, LocalMap
from ..io import map_saver
from ..sensor.data import ScanData


def save(slam, prefix: str):
    # Mid-run snapshots must carry the true out-of-extent count, not 0:
    # the counter is device-accumulated and only lands in the metric
    # registry on flush (advisor r04).
    slam.builder.flush_oob()
    map_saver.save_pose_graph(slam.pose_graph, f"{prefix}.posegraph.json")
    scans = {}
    meta = []
    for n in slam.pose_graph.scan_nodes:
        s = n.scan_data
        if s is None:  # dropped by owner retention: another rank holds it
            continue
        scans[f"ranges_{n.node_id}"] = s.ranges
        scans[f"angles_{n.node_id}"] = s.angles
        meta.append(
            dict(
                node_id=n.node_id,
                sensor_id=s.sensor_id,
                time_stamp=s.time_stamp,
                odom_pose=[float(v) for v in s.odom_pose],
                rel_sensor_pose=[float(v) for v in s.relative_sensor_pose],
                min_range=s.min_range,
                max_range=s.max_range,
                min_angle=s.min_angle,
                max_angle=s.max_angle,
            )
        )
    np.savez_compressed(f"{prefix}.scans.npz", **scans)
    maps = {}
    for lm in slam.builder.local_maps:
        if lm.compacted:
            # Compacted finished map (LocalMap.compact): persist the u8
            # form — the round trip is bit-exact by construction.  (The
            # only device->host fetch of the compact raster happens here,
            # at checkpoint time.)
            maps[f"pq_{lm.local_map_id}"] = np.asarray(lm.prob_q)
            maps[f"obs_{lm.local_map_id}"] = np.packbits(
                np.asarray(lm.observed, bool), axis=None
            )
            continue
        if lm.logodds is None:  # dropped on this rank: the owner saves it
            continue
        maps[f"lo_{lm.local_map_id}"] = np.asarray(lm.logodds, np.float32)
        maps[f"obs_{lm.local_map_id}"] = np.packbits(
            np.asarray(lm.observed, bool), axis=None
        )
    np.savez_compressed(f"{prefix}.maps.npz", **maps)
    state = dict(
        scan_meta=meta,
        local_maps=[
            dict(
                id=lm.local_map_id,
                scan_min=lm.scan_node_id_min,
                scan_max=lm.scan_node_id_max,
                finished=lm.finished,
            )
            for lm in slam.builder.local_maps
        ],
        accum_travel_dist=slam.builder.accum_travel_dist,
        travel_dist_last_local_map=slam.builder.travel_dist_last_local_map,
        frontend=dict(
            process_count=slam.frontend.process_count,
            input_count=slam.frontend.input_count,
            accumulated_travel_dist=slam.frontend.accumulated_travel_dist,
            accumulated_angle=slam.frontend.accumulated_angle,
            last_odom_pose=[float(v) for v in slam.frontend.last_odom_pose],
            last_map_update_odom_pose=[
                float(v) for v in slam.frontend.last_map_update_odom_pose
            ],
            last_map_update_time=slam.frontend.last_map_update_time,
            last_loop_detection_dist=slam.frontend.last_loop_detection_dist,
        ),
    )
    Path(f"{prefix}.state.json").write_text(json.dumps(state, indent=1))


def load(slam, prefix: str):
    """Restore state into a freshly constructed SLAM instance (same
    configuration as at save time)."""
    pg = map_saver.load_pose_graph(f"{prefix}.posegraph.json")
    state = json.loads(Path(f"{prefix}.state.json").read_text())
    scans = np.load(f"{prefix}.scans.npz")
    maps_path = Path(f"{prefix}.maps.npz")
    maps = np.load(maps_path) if maps_path.exists() else {}
    for m in state["scan_meta"]:
        nid = m["node_id"]
        pg.scan_nodes[nid].scan_data = ScanData(
            m["sensor_id"],
            m["time_stamp"],
            np.asarray(m["odom_pose"]),
            np.zeros(3),
            np.asarray(m["rel_sensor_pose"]),
            m["min_range"],
            m["max_range"],
            m["min_angle"],
            m["max_angle"],
            scans[f"angles_{nid}"],
            scans[f"ranges_{nid}"],
        )
    slam.pose_graph = pg

    builder: GridMapBuilder = slam.builder
    builder.local_maps = []
    cfg = builder.cfg
    for lm_meta in state["local_maps"]:
        mid = lm_meta["id"]
        map_node = pg.local_map_nodes[mid]
        lo, obs, offset = builder._new_raster(cfg.local_map_rows, cfg.local_map_cols)
        scan_ids = list(range(lm_meta["scan_min"], lm_meta["scan_max"] + 1))
        # Local maps seeded with overlapped scans at creation also contain
        # scans preceding scan_min (grid_map_builder.cpp:252-276)
        if mid > 0:
            prev_max = state["local_maps"][mid - 1]["scan_max"]
            n_seed = min(prev_max + 1, cfg.num_overlapped_scans)
            first = max(0, prev_max - (n_seed - 1))
            scan_ids = list(range(first, prev_max + 1)) + scan_ids
        # Reconstruct per-scan global poses from the invariant map-local
        # poses through each scan's own map node, so the rebuilt raster
        # stays consistent after loop closures moved node poses.
        entries = []
        for sid in scan_ids:
            node = pg.scan_nodes[sid]
            own_map = pg.local_map_nodes[node.local_map_id]
            gp = P.compound(own_map.global_pose, node.local_pose)
            entries.append((gp, node.scan_data))
        lm = LocalMap(
            mid, lo, obs, offset,
            scan_node_id_min=lm_meta["scan_min"],
            scan_node_id_max=lm_meta["scan_max"],
            finished=lm_meta["finished"],
        )
        if f"pq_{mid}" in maps:
            # Compacted u8 raster (LocalMap.compact): bit-exact restore
            # of the compact form (back onto the device).
            import jax.numpy as jnp

            shape = (cfg.local_map_rows, cfg.local_map_cols)
            lm.logodds = None
            lm.shape = shape
            lm.prob_q = jnp.asarray(maps[f"pq_{mid}"])
            lm.observed = jnp.asarray(
                np.unpackbits(maps[f"obs_{mid}"], axis=None)[
                    : shape[0] * shape[1]
                ].reshape(shape).astype(bool)
            )
            lm.compacted = True
        elif f"lo_{mid}" in maps:
            # Saved raster: exact, no re-rasterization needed
            import jax.numpy as jnp

            lm.logodds = jnp.asarray(maps[f"lo_{mid}"])
            lm.observed = jnp.asarray(
                np.unpackbits(maps[f"obs_{mid}"], axis=None)[
                    : lm.logodds.size
                ].reshape(lm.logodds.shape).astype(bool)
            )
        elif all(s is not None for _, s in entries):
            # Legacy checkpoint without .maps.npz: rebuild from scans
            lm.logodds, lm.observed = builder._integrate(
                lo, obs, offset, map_node.global_pose, entries
            )
        else:
            # Owner-sharded checkpoint: this rank never held the map's
            # heavy state — restore it as the retention policy left it.
            lm.drop_heavy()
        builder.local_maps.append(lm)
    builder.accum_travel_dist = state["accum_travel_dist"]
    builder.travel_dist_last_local_map = state["travel_dist_last_local_map"]

    fe = state["frontend"]
    slam.frontend.process_count = fe["process_count"]
    slam.frontend.input_count = fe["input_count"]
    slam.frontend.accumulated_travel_dist = fe.get("accumulated_travel_dist", 0.0)
    slam.frontend.accumulated_angle = fe.get("accumulated_angle", 0.0)
    slam.frontend.last_odom_pose = np.asarray(fe["last_odom_pose"])
    slam.frontend.last_map_update_odom_pose = np.asarray(
        fe["last_map_update_odom_pose"]
    )
    slam.frontend.last_map_update_time = fe["last_map_update_time"]
    slam.frontend.last_loop_detection_dist = fe["last_loop_detection_dist"]
    return slam
