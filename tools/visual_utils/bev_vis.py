"""BEV scene visualization (matplotlib; replaces the reference's
mayavi/open3d renderers in tools/visual_utils/ — neither is available in
headless TPU environments, and a BEV PNG covers the demo/debug use case).

Usage:
    from tools.visual_utils.bev_vis import draw_scene
    draw_scene(points, gt_boxes=..., pred_boxes=..., save='scene.png')
"""
from __future__ import annotations

import numpy as np


def _box_corners_bev(boxes):
    """(N, 7) -> (N, 4, 2) BEV corner polygons."""
    template = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32) / 2
    corners = boxes[:, None, 3:5] * template[None]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    return np.stack([x, y], -1) + boxes[:, None, 0:2]


def draw_scene(points, gt_boxes=None, pred_boxes=None, pred_scores=None,
               save=None, title=None, point_size=0.3, figsize=(12, 12)):
    """points (N, 3+); gt_boxes/pred_boxes (M, 7). Returns the figure."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon

    fig, ax = plt.subplots(figsize=figsize)
    ax.set_facecolor('black')
    fig.patch.set_facecolor('black')
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=point_size, c=pts[:, 2],
               cmap='viridis', linewidths=0)

    def draw_boxes(boxes, color, scores=None):
        for i, poly in enumerate(_box_corners_bev(np.asarray(boxes))):
            ax.add_patch(Polygon(poly, fill=False, edgecolor=color,
                                 linewidth=1.2))
            if scores is not None:
                ax.text(poly[0, 0], poly[0, 1], f'{scores[i]:.2f}',
                        color=color, fontsize=7)

    if gt_boxes is not None and len(gt_boxes):
        draw_boxes(gt_boxes, 'lime')
    if pred_boxes is not None and len(pred_boxes):
        draw_boxes(pred_boxes, 'red', pred_scores)

    ax.set_aspect('equal')
    if title:
        ax.set_title(title, color='white')
    ax.tick_params(colors='gray')
    if save:
        fig.savefig(save, dpi=120, bbox_inches='tight',
                    facecolor=fig.get_facecolor())
        plt.close(fig)
    return fig
