"""Persistent frame-change handler (splashsurf_studio/src/handlers.py:7-28
analog): re-run the reconstruction on every frame change."""

from __future__ import annotations

try:
    import bpy
    from bpy.app.handlers import persistent

    HAS_BPY = True
except Exception:  # pragma: no cover
    HAS_BPY = False

    def persistent(f):
        return f


@persistent
def generate_mesh(scene, depsgraph=None):
    from splashsurf_tpu.studio import updater

    if depsgraph is None:
        depsgraph = bpy.context.evaluated_depsgraph_get()
    updater.update_entries(scene, depsgraph)


def register():
    if generate_mesh not in bpy.app.handlers.frame_change_post:
        bpy.app.handlers.frame_change_post.append(generate_mesh)


def unregister():
    if generate_mesh in bpy.app.handlers.frame_change_post:
        bpy.app.handlers.frame_change_post.remove(generate_mesh)
