"""Open3D match visualization (``plot_match``/``LineMesh``,
``utils/utils_test.py:149-403``).

Three side-by-side panels over the two clouds: (1) predicted matches with
confidence-colored lines, (2) ground-truth matches in green, (3) true
positives green / false positives red. Keypoints render as red spheres and
match lines as cylinder meshes (Open3D line widths are unreliable, hence
the cylinder trick — same approach as the reference's LineMesh).

Open3D is an optional dependency (not required by train/eval); importing
this module without it raises only when the plot function is called.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _require_o3d():
    try:
        import open3d as o3d
        return o3d
    except ImportError as e:
        raise ImportError(
            "open3d is required for visualization: pip install open3d"
        ) from e


def _cylinder_lines(o3d, points, lines, colors, radius):
    """Cylinder meshes along each line segment (LineMesh equivalent)."""
    meshes = []
    for li, (a, b) in enumerate(lines):
        p0, p1 = np.asarray(points[a]), np.asarray(points[b])
        seg = p1 - p0
        length = float(np.linalg.norm(seg))
        if length < 1e-9:
            continue
        mesh = o3d.geometry.TriangleMesh.create_cylinder(radius, length)
        mesh.paint_uniform_color(colors[li % len(colors)])
        # rotate z-axis onto the segment direction
        z = np.array([0.0, 0.0, 1.0])
        d = seg / length
        axis = np.cross(z, d)
        s = np.linalg.norm(axis)
        if s > 1e-9:
            axis = axis / s * np.arccos(np.clip(np.dot(z, d), -1, 1))
            R = o3d.geometry.get_rotation_matrix_from_axis_angle(axis)
            mesh.rotate(R, center=(0, 0, 0))
        mesh.translate((p0 + p1) / 2)
        meshes.append(mesh)
    return meshes


def _spheres(o3d, pts, color, radius=0.3):
    out = []
    for p in pts:
        s = o3d.geometry.TriangleMesh.create_sphere(radius)
        s.paint_uniform_color(color)
        s.translate(p)
        out.append(s)
    return out


def plot_match(pc0, pc1, kpts0, kpts1, mkpts0, mkpts1, mkpts0_gt, mkpts1_gt,
               matches, mconf, true_positive, false_positive,
               T: Optional[np.ndarray] = None, line_radius: float = 0.2,
               offset: float = 50.0):
    """Render the three-panel match comparison. Blocking Open3D window."""
    o3d = _require_o3d()
    geoms = []
    shift = np.array([0.0, offset, 0.0])

    def panel(dy, pairs0, pairs1, colors):
        off = np.array([0.0, dy, 0.0])
        g = []
        g += _spheres(o3d, kpts0 + off, [1, 0, 0])
        g += _spheres(o3d, kpts1 + off + shift / 2, [1, 0, 0])
        pts = np.concatenate([pairs0 + off, pairs1 + off + shift / 2])
        lines = [(i, i + len(pairs0)) for i in range(len(pairs0))]
        g += _cylinder_lines(o3d, pts, lines, colors, line_radius)
        if len(pc0):
            c = o3d.geometry.PointCloud()
            c.points = o3d.utility.Vector3dVector(np.asarray(pc0)[:, :3] + off)
            c.paint_uniform_color([0.7, 0.7, 0.7])
            g.append(c)
        return g

    # panel 1: predictions colored by confidence (blue->red)
    conf_colors = [[float(c), 0.2, 1.0 - float(c)] for c in
                   np.clip(mconf, 0, 1)] or [[0, 0, 1]]
    geoms += panel(0.0, mkpts0, mkpts1, conf_colors)
    # panel 2: ground truth in green
    geoms += panel(2 * offset, mkpts0_gt, mkpts1_gt, [[0, 1, 0]])
    # panel 3: TP green / FP red
    tp_idx = np.nonzero(np.asarray(true_positive))[0]
    fp_idx = np.nonzero(np.asarray(false_positive))[0]
    valid_idx = np.nonzero(matches > -1)[0]
    tp_set = set(tp_idx.tolist())
    colors3 = [[0, 1, 0] if i in tp_set else [1, 0, 0] for i in valid_idx]
    geoms += panel(4 * offset, kpts0[valid_idx],
                   kpts1[matches[valid_idx]], colors3 or [[1, 0, 0]])

    o3d.visualization.draw_geometries(geoms)
