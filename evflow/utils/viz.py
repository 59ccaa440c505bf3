"""Visualization: flow color wheel, event images, error heatmaps, vector
fields, per-sequence image/video storage, activity plots.

Behavioral reference: utils/visualization.py (Visualization.update :43-220,
.store :222-570, error_to_image :617-645, flow_to_image :648-709,
flow_to_vector :711-1022, events_to_image :1036-1084, vis_activity
:1087-1126).

Everything renders headless to uint8 RGB numpy arrays; cv2 is used for
storage (PNG / mp4) and the optional live windows, guarded so the module
works without a display.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

__all__ = [
    "flow_to_image",
    "events_to_image",
    "error_to_image",
    "flow_to_vector",
    "Visualization",
    "vis_activity",
]


def flow_to_image(flow: np.ndarray, uniform_v: Optional[float] = None) -> np.ndarray:
    """HSV color-wheel flow rendering — the reference's exact formula
    (visualization.py:648-709, pinned by tests/test_reference_direct.py):
    hue = atan2(fy, fx) wrapped to [0, 1]; value = P5–P95
    percentile-normalized magnitude with a sqrt boost, scaled ×1.3 with a
    0.15 brightness floor; true-zero flow stays black; uniform nonzero
    fields take the ``uniform_v`` scale.

    flow: [H, W, 2] (x, y). Returns uint8 RGB.
    """
    import matplotlib.colors

    fx = np.asarray(flow[..., 0], dtype=float)
    fy = np.asarray(flow[..., 1], dtype=float)
    mag = np.sqrt(fx * fx + fy * fy)
    max_mag = float(np.max(mag))
    mag_range = max_mag - float(np.min(mag))

    ang = (np.arctan2(fy, fx) + np.pi) / (2.0 * np.pi)
    hsv = np.zeros((*fx.shape, 3), dtype=float)
    hsv[..., 0] = ang
    hsv[..., 1] = 1.0

    if mag_range > 0.0:
        p5 = float(np.percentile(mag, 5))
        p95 = float(np.percentile(mag, 95))
        norm = np.clip((mag - p5) / (p95 - p5 + 1e-8), 0.0, 1.0) ** 0.5
        hsv[..., 2] = np.where(
            mag > 0, np.clip(norm * 1.3 + 0.15, 0.15, 1.0), 0.0
        )
    elif max_mag > 0.0:
        v = mag / max_mag
        if uniform_v is not None:
            v = v * float(uniform_v)
        v = v**0.5 * 1.3 + 0.15
        hsv[..., 2] = np.where(mag > 0, np.clip(v, 0.15, 1.0), 0.0)

    return (255 * matplotlib.colors.hsv_to_rgb(hsv)).astype(np.uint8)


def events_to_image(event_cnt: np.ndarray) -> np.ndarray:
    """Green(+)/red(−) event count rendering — the reference's exact
    formula (visualization.py:1036-1084 ``green_red`` scheme, pinned by
    tests/test_reference_direct.py): per-polarity P1–P99 normalization
    against the shared max, positive events on the green channel,
    negative on red, overlap keeping both.

    event_cnt: [H, W, 2] per-polarity counts. Returns uint8 RGB.
    """
    pos = np.asarray(event_cnt[..., 0], dtype=float)
    neg = np.asarray(event_cnt[..., 1], dtype=float)
    pos_max, pos_min = np.percentile(pos, 99), np.percentile(pos, 1)
    neg_max, neg_min = np.percentile(neg, 99), np.percentile(neg, 1)
    mx = pos_max if pos_max > neg_max else neg_max
    if pos_min != mx:
        pos = (pos - pos_min) / (mx - pos_min)
    if neg_min != mx:
        neg = (neg - neg_min) / (mx - neg_min)
    pos = np.clip(pos, 0, 1)
    neg = np.clip(neg, 0, 1)

    img = np.zeros((*pos.shape, 3), dtype=float)
    mask_pos = pos > 0
    mask_neg = neg > 0
    img[..., 1][mask_pos] = pos[mask_pos]
    img[..., 0][mask_neg] = neg[mask_neg]
    return (255 * img).astype(np.uint8)


def error_to_image(error: np.ndarray, mask: Optional[np.ndarray] = None,
                   rad_to_deg: bool = False) -> np.ndarray:
    """Red error-gradient heatmap (visualization.py:617-645).

    ``rad_to_deg=True`` is the reference's exact path (radians → degrees,
    fixed [0°, 180°] scale — pinned by tests/test_reference_direct.py);
    the default percentile normalization is an evflow extension for
    non-angular errors (AEE px maps have no fixed natural scale)."""
    e = error.astype(np.float32).copy()
    if rad_to_deg:
        e = np.degrees(e) / 180.0
    else:
        p = np.percentile(e, 95)
        e = e / (p + 1e-9)
    e = np.clip(e, 0, 1)
    if mask is not None:
        e = e * mask
    img = np.zeros((*e.shape, 3), np.uint8)
    img[..., 0] = (e * 255).astype(np.uint8)
    return img


def flow_to_vector(
    flow: np.ndarray,
    step: int = 8,
    scale: float = 1.0,
    gtflow: Optional[np.ndarray] = None,
    mode: str = "grid",
    mask: Optional[np.ndarray] = None,
    background: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Arrow-field rendering (visualization.py:711-1022; sparse / grid /
    center modes). Predicted arrows green; optional GT overlay in blue.

    ``sparse`` draws arrows only at (subsampled) mask-active pixels — the
    reference's event-masked vector field; ``center`` draws one mean-flow
    arrow. ``background`` (uint8 RGB) is drawn under the arrows."""
    H, W = flow.shape[:2]
    if background is not None:
        img = background.copy()
    else:
        img = np.zeros((H, W, 3), np.uint8)
    if cv2 is None:
        return img

    def draw(f, color):
        if mode == "center":
            if mask is not None and mask.sum() > 0:
                m = mask.astype(bool)
                mean = f[m].reshape(-1, 2).mean(axis=0)
            else:
                mean = f.reshape(-1, 2).mean(axis=0)
            y, x = H // 2, W // 2
            cv2.arrowedLine(
                img, (x, y),
                (int(x + mean[0] * scale * 10), int(y + mean[1] * scale * 10)),
                color, 1, tipLength=0.3,
            )
            return
        for y in range(step // 2, H, step):
            for x in range(step // 2, W, step):
                if mode == "sparse" and (mask is None or not mask[y, x]):
                    continue
                v = f[y, x]
                cv2.arrowedLine(
                    img, (x, y),
                    (int(x + v[0] * scale), int(y + v[1] * scale)),
                    color, 1, tipLength=0.3,
                )

    draw(flow, (0, 255, 0))
    if gtflow is not None:
        draw(gtflow, (255, 128, 0))
    return img


class Visualization:
    """Store (and optionally display) per-window visual artifacts.

    Mirrors the reference's directory layout: per-sequence subfolders
    ``events/ flow/ gtflow/ masked_flow/ iwe/ error/ stitched/`` holding
    numbered PNGs, or mp4 writers in video mode; ``store_interval``
    throttles by event timestamp (visualization.py:222-570)."""

    KINDS = ("events", "flow", "gtflow", "masked_flow_grad", "masked_flow_vec",
             "iwe", "error", "stitched")

    def __init__(self, config: Dict, eval_id: int = -1, path_results: Optional[str] = None,
                 vis_type: str = "gradients"):
        vis = config.get("vis", {})
        self.px = int(vis.get("px", 400))
        self.store_type = vis.get("store_type", "image")
        self.store_interval = float(vis.get("store_interval", 0.0))
        self.enabled_live = bool(vis.get("enabled", False))
        self.vis_type = vis_type
        # arrow-field options (visualization.py:711-1022 modes)
        self.vec_mode = vis.get("vec_mode", "grid")  # sparse | grid | center
        self.vec_step = int(vis.get("vec_step", 8))
        self.vec_scale = float(vis.get("vec_scale", 1.0))
        self.path = None
        if path_results is not None:
            self.path = os.path.join(path_results, f"eval_{eval_id}")
        self.frame_idx: Dict[str, int] = {}
        self.writers: Dict[str, object] = {}
        self.last_store_ts: Dict[str, float] = {}

    def _dir(self, sequence: str, kind: str) -> str:
        d = os.path.join(self.path, sequence, kind)
        os.makedirs(d, exist_ok=True)
        return d

    def _write(self, sequence: str, kind: str, img: np.ndarray):
        if cv2 is None or self.path is None:
            return
        key = f"{sequence}/{kind}"
        idx = self.frame_idx.get(key, 0)
        bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        if self.store_type == "video":
            if key not in self.writers:
                path = os.path.join(self._dir(sequence, kind), f"{kind}.mp4")
                self.writers[key] = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (img.shape[1], img.shape[0]),
                )
            self.writers[key].write(bgr)
        else:
            cv2.imwrite(os.path.join(self._dir(sequence, kind), f"{idx:06d}.png"), bgr)
        self.frame_idx[key] = idx + 1

    def store(
        self,
        inputs: Dict[str, np.ndarray],
        flow: np.ndarray,
        iwe: Optional[np.ndarray],
        sequence: str,
        events_window=None,
        masked_flow=None,
        iwe_window=None,
        ts: float = 0.0,
        error_map: Optional[np.ndarray] = None,
        error_is_angle: bool = False,
    ):
        """Store one window's renderings (eval_flow.py:324-336 call shape).

        Arrays are NHWC batch-1 or already [H, W, C]. ``masked_flow`` (the
        event-masked window flow, loss/flow.py:465-474) produces both the
        color-wheel ``masked_flow_grad`` and the arrow-field
        ``masked_flow_vec`` panels with GT overlay
        (visualization.py:222-570,711-1022); angular error maps render in
        degrees (``error_is_angle``, visualization.py:617-645)."""
        if self.path is None:
            return
        if self.store_interval > 0.0:
            last = self.last_store_ts.get(sequence, -1e18)
            if ts - last < self.store_interval:
                return
            self.last_store_ts[sequence] = ts

        def first(x):
            x = np.asarray(x)
            return x[0] if x.ndim == 4 else x

        gt = None
        if "gtflow" in inputs and inputs["gtflow"] is not None:
            gt = first(inputs["gtflow"])

        panels = {}
        panels["events"] = events_to_image(first(inputs["event_cnt"]))
        panels["flow"] = flow_to_image(first(flow))
        if gt is not None:
            panels["gtflow"] = flow_to_image(gt)
        if masked_flow is not None:
            mf = first(masked_flow)
            em = np.asarray(inputs.get("event_mask"))
            em2 = None
            if em is not None and em.size:
                em2 = (em[0] if em.ndim == 4 else em)[..., 0] > 0
            panels["masked_flow_grad"] = flow_to_image(mf)
            panels["masked_flow_vec"] = flow_to_vector(
                mf,
                step=self.vec_step,
                scale=self.vec_scale,
                gtflow=gt,
                mode=self.vec_mode,
                mask=em2,
                background=panels["events"] // 2,
            )
        if iwe is not None:
            panels["iwe"] = events_to_image(first(iwe))
        if error_map is not None:
            e = np.asarray(error_map)
            panels["error"] = error_to_image(
                e[0] if e.ndim == 3 else e, rad_to_deg=error_is_angle
            )

        for kind, img in panels.items():
            self._write(sequence, kind, img)

        # labeled 2x2 stitched panel (visualization.py labeled stitch)
        keys = [k for k in ("events", "flow", "gtflow", "iwe") if k in panels]
        if len(keys) >= 2 and cv2 is not None:
            h = max(panels[k].shape[0] for k in keys)
            w = max(panels[k].shape[1] for k in keys)
            cells = []
            for k in keys[:4]:
                img = cv2.resize(panels[k], (w, h))
                cv2.putText(img, k, (4, 14), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                            (255, 255, 255), 1)
                cells.append(img)
            while len(cells) < 4:
                cells.append(np.zeros((h, w, 3), np.uint8))
            stitched = np.vstack([np.hstack(cells[:2]), np.hstack(cells[2:])])
            self._write(sequence, "stitched", stitched)

    def update(self, inputs, flow, iwe=None, masked_flow=None, *args, **kwargs):
        """Live window suite (visualization.py:43-220): one cv2 window per
        available panel (events / flow / gtflow / iwe / masked flow vectors);
        no-op without a display."""
        if not self.enabled_live or cv2 is None or not os.environ.get("DISPLAY"):
            return

        def first(x):
            x = np.asarray(x)
            return x[0] if x.ndim == 4 else x

        gt = None
        if isinstance(inputs, dict) and inputs.get("gtflow") is not None:
            gt = first(inputs["gtflow"])
        windows = {"flow": flow_to_image(first(flow))}
        if isinstance(inputs, dict) and "event_cnt" in inputs:
            windows["events"] = events_to_image(first(inputs["event_cnt"]))
        if gt is not None:
            windows["gtflow"] = flow_to_image(gt)
        if iwe is not None:
            windows["iwe"] = events_to_image(first(iwe))
        if masked_flow is not None:
            windows["masked_flow_vec"] = flow_to_vector(
                first(masked_flow), step=self.vec_step, scale=self.vec_scale,
                gtflow=gt, mode=self.vec_mode,
            )
        px = self.px
        for name, img in windows.items():
            h, w = img.shape[:2]
            img = cv2.resize(img, (int(w * px / max(h, 1)), px),
                             interpolation=cv2.INTER_NEAREST)
            cv2.imshow(name, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.waitKey(1)

    def close_videos(self):
        for w in self.writers.values():
            try:
                w.release()
            except Exception:
                pass
        self.writers = {}


def _draw_activity_live(activity_log: Dict[str, list]):
    """Redraw the interactive per-layer activity figure (one persistent
    window, updated in place — visualization.py:1087-1126)."""
    import matplotlib.pyplot as plt

    fig = getattr(_draw_activity_live, "_fig", None)
    if fig is None or not plt.fignum_exists(fig.number):
        plt.ion()
        fig, ax = plt.subplots(figsize=(10, 5))
        _draw_activity_live._fig = fig
        _draw_activity_live._ax = ax
    ax = _draw_activity_live._ax
    ax.clear()
    for k, vals in activity_log.items():
        ax.plot(vals, label=k)
    ax.set_xlabel("window")
    ax.set_ylabel("fraction nonzero")
    ax.legend(fontsize=7, loc="upper right")
    fig.canvas.draw_idle()
    plt.pause(0.001)


def vis_activity(activity: Dict[str, float], activity_log: Optional[Dict[str, list]],
                 save_path: Optional[str] = None, live: bool = False):
    """Accumulate + (optionally) plot per-layer nonzero-activity traces
    (visualization.py:1087-1126). Returns the updated log.

    ``live`` redraws an interactive matplotlib window each call — the
    reference's live activity plot during evaluation (eval_flow.py:338);
    no-op without a display."""
    if activity is None:
        return activity_log
    if activity_log is None:
        activity_log = {k: [] for k in activity}
    for k, v in activity.items():
        activity_log.setdefault(k, []).append(float(v))
    if live and os.environ.get("DISPLAY"):
        _draw_activity_live(activity_log)
    if save_path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        for k, vals in activity_log.items():
            ax.plot(vals, label=k)
        ax.set_xlabel("window")
        ax.set_ylabel("fraction nonzero")
        ax.legend(fontsize=7)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return activity_log
