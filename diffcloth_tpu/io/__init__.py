"""IO subsystem: trajectory export/import, replay, offline visualization.

Parity targets in the reference: `exportSimulation` (Simulation.cpp:4195),
`resetForwardRecordsFromFolder` (Simulation.h:574), the OpenGL Viewer
(src/code/engine/Viewer.cpp — replaced by offline rendering, which satisfies
the visualization *capability* without porting GL; SURVEY.md section 2.6).
"""
from diffcloth_tpu.geometry.objio import (export_frames, import_frames,
                                          load_obj, save_obj)
from diffcloth_tpu.io.export import (export_episode, export_frame_info,
                                     import_episode)
from diffcloth_tpu.io.viewer import render_episode, render_frame

__all__ = [
    "export_frames", "import_frames", "load_obj", "save_obj",
    "export_episode", "export_frame_info", "import_episode",
    "render_episode", "render_frame",
]
