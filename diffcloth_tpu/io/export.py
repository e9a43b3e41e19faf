"""Episode export / re-import: OBJ frame sequences + structured metadata.

Parity with the reference's artifact format (SURVEY.md section 2.1
Export/import):
  - per-frame OBJ export with an `info.txt` carrying the clip (fixed-point)
    positions (`exportSimulation` + `exportFrameInfo`,
    Simulation.cpp:4195-4239, Simulation.h:846-861),
  - per-episode statistics log (`exportStatistics`, Simulation.cpp:4003),
  - re-import of an exported folder for replay/visualization
    (`resetForwardRecordsFromFolder`, Simulation.h:574-620).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from diffcloth_tpu.geometry import objio


def export_frame_info(path: str, x_fixed: np.ndarray,
                      extra: Optional[Dict] = None) -> None:
    """Write a frame's info.txt: one 'x y z' clip position per line, then an
    optional JSON trailer line (reference info.txt carries clip positions)."""
    lines = [f"{p[0]:.10f} {p[1]:.10f} {p[2]:.10f}"
             for p in np.asarray(x_fixed).reshape(-1, 3)]
    if extra:
        lines.append(json.dumps(extra))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def export_episode(folder: str, recs, tris: np.ndarray,
                   stats: Optional[Dict] = None) -> None:
    """Export an EpisodeRecords to `folder/`:

      clothXXX.obj        per-frame mesh (frame 0 = initial state)
      infoXXX.txt         per-frame clip positions
      episode.json        converged/iters/deformation per step + extra stats
    """
    os.makedirs(folder, exist_ok=True)
    xs = np.asarray(recs.full_x())
    xf = np.asarray(recs.steps.x_fixed)
    tris = np.asarray(tris)
    for i, x in enumerate(xs):
        objio.save_obj(os.path.join(folder, f"cloth{i}.obj"), x, tris)
        fixed = xf[i - 1] if i > 0 else (xf[0] if len(xf) else
                                         np.zeros((0, 3)))
        export_frame_info(os.path.join(folder, f"info{i}.txt"), fixed)
    log = {
        "n_frames": int(xs.shape[0]),
        "converged": np.asarray(recs.steps.converged).astype(int).tolist(),
        "iters": np.asarray(recs.steps.iters).astype(int).tolist(),
        "avg_deformation":
            np.asarray(recs.steps.avg_deformation).astype(float).tolist(),
        "max_deformation":
            np.asarray(recs.steps.max_deformation).astype(float).tolist(),
    }
    if stats:
        log.update(stats)
    with open(os.path.join(folder, "episode.json"), "w") as fh:
        json.dump(log, fh, indent=1)


def import_episode(folder: str):
    """Re-import an exported episode folder for replay.

    Returns (xs (N+1,n,3), tris (T,3), info dict or None) — the replay
    analog of resetForwardRecordsFromFolder (Simulation.h:574-620), feeding
    `io.viewer.render_episode` (the -mode visualize path)."""
    xs = objio.import_frames(folder, prefix="cloth")
    files = sorted(f for f in os.listdir(folder)
                   if f.startswith("cloth") and f.endswith(".obj"))
    _, tris = objio.load_obj(os.path.join(folder, files[0]))
    info = None
    meta = os.path.join(folder, "episode.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            info = json.load(fh)
    return xs, tris, info
