#!/usr/bin/env python
"""Blender dataset authoring: render camera paths and emit ``cam_data.json``.

Run *inside Blender* (``blender scene.blend --background --python
tools/blender_create_pictures.py``). Equivalent of the reference's
``DatasetUtils/blender_create_pictures.py:60-161``: places the scene camera on
left-to-right / sphere / full-circle paths, renders each pose, and writes the
``cam_data.json`` metadata file the Blender loader consumes
(``nerf_and_dietnerf_tpu/data/loaders.py:load_blender``):

    {"focal_length": ..., "field_of_view": ...,
     "frames": [{"filename": ..., "transformation_matrix": [[...]]}]}

Edit PATHS_TO_RENDER below for your scene (Blender has no CLI arg passing
worth using inside --python scripts).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

try:
    import bpy
    import mathutils
except ImportError as e:  # pragma: no cover - only runs inside Blender
    raise SystemExit("run this script inside Blender (--background --python)") from e

CAMERA_NAME = "Camera"
IMAGE_NAME_FORMAT = "frame_{:02d}.png"

# (kind, n_pics, resolution, save_dir); kind: "l_to_r" | "sphere" | "full_circle"
PATHS_TO_RENDER = [
    ("sphere", 72, 256, "Assets/MyScene/image_views_sphere/256px_72pics"),
    ("l_to_r", 16, 256, "Assets/MyScene/image_views_l_to_r/256px_16pics"),
]

SPHERE_RADIUS = 2.0
L_TO_R_Z_DISTANCE = 2.0


def sphere_mat(radius, x_rot, y_rot, z_rot):
    """c2w on a sphere looking at the origin — identical composition to the
    runtime's ``pose_math.sphere_c2w`` so renders and loads agree."""
    t = mathutils.Matrix.Translation((0, 0, radius))
    m = mathutils.Matrix.Rotation(math.radians(x_rot), 4, "X") @ t
    m = mathutils.Matrix.Rotation(math.radians(y_rot), 4, "Y") @ m
    return mathutils.Matrix.Rotation(math.radians(z_rot), 4, "Z") @ m


def path_matrices(kind, n_pics):
    if kind == "l_to_r":
        mats = []
        for x in np.linspace(-1.0, 1.0, n_pics):
            m = mathutils.Matrix.Identity(4)
            m[0][3], m[2][3] = float(x), L_TO_R_Z_DISTANCE
            mats.append(m)
        return mats
    if kind == "sphere":
        # Upper-hemisphere sweep: x in [-90, 0) rows, y around.
        mats = []
        rows = max(1, int(round(math.sqrt(n_pics / 2))))
        per_row = max(1, n_pics // rows)
        for x in np.linspace(-75, -15, rows):
            for y in np.linspace(-180, 180, per_row, endpoint=False):
                mats.append(sphere_mat(SPHERE_RADIUS, float(x), float(y), 0))
        return mats[:n_pics]
    if kind == "full_circle":
        return [
            sphere_mat(SPHERE_RADIUS, 0, float(y), 0)
            for y in np.linspace(-90, 270, n_pics + 1)[:-1]
        ]
    raise ValueError(kind)


def render_path(kind, n_pics, resolution, save_dir):
    os.makedirs(save_dir, exist_ok=True)
    cam = bpy.data.objects[CAMERA_NAME]
    scene = bpy.context.scene
    scene.render.resolution_x = scene.render.resolution_y = resolution
    cam_data = {
        "focal_length": bpy.data.cameras[0].lens,
        "field_of_view": bpy.data.cameras[0].angle,
        "frames": [],
    }
    for i, mat in enumerate(path_matrices(kind, n_pics)):
        cam.matrix_world = mat
        name = IMAGE_NAME_FORMAT.format(i)
        scene.render.filepath = os.path.join(save_dir, name)
        bpy.ops.render.render(write_still=True)
        cam_data["frames"].append(
            {"filename": name, "transformation_matrix": np.array(mat).tolist()}
        )
    with open(os.path.join(save_dir, "cam_data.json"), "w", encoding="utf-8") as f:
        json.dump(cam_data, f, ensure_ascii=False, indent=4)
    print(f"rendered {n_pics} views -> {save_dir}")


if __name__ == "__main__":
    for spec in PATHS_TO_RENDER:
        render_path(*spec)
