"""Pure-Python loop oracles for the detection geometry/matching semantics —
direct ports of the reference's per-pixel loops (CloudShadowMatching.cpp,
ProbabilityRefinement.cpp), deliberately slow and literal, used to validate
the vectorized TPU kernels on small scenes."""

import numpy as np


def sides(h, w, diag):
    n = np.sqrt(float(w) * w + float(h) * h)
    return diag * w / n, diag * h / n


def pos(h, w, diag, i, j, alpha=0.5, beta=0.5):
    sx, sy = sides(h, w, diag)
    return np.array([sx * (i + alpha) / w, sy * (j + beta) / h, 0.0])


def index(h, w, diag, p):
    sx, sy = sides(h, w, diag)
    return int(np.floor(w * p[0] / sx)), int(np.floor(h * p[1] / sy))


def at(a, i, j):
    """Bottom-left accessor (ImageOperations.h:24-45)."""
    return a[a.shape[0] - 1 - j, i]


def similarity_comparison_oracle(
    cloud_id, quad_corners, m, cloud_map, cloud_mask, potential_shadow, diag
):
    """Literal port of __SimilarityComparision__ (CloudShadowMatching.cpp:12-110).

    Returns (similarity, hit_pixels, window_bounds) where hit_pixels is a
    list of (x, y-from-bottom) and window_bounds=(min_x,min_y,max_x,max_y).
    """
    h, w = cloud_map.shape
    m_inv = np.linalg.inv(m)

    # transformed quad corners -> window
    corners_w = []
    for c in quad_corners:
        hom = m @ np.array([c[0], c[1], c[2], 1.0])
        corners_w.append(hom[:3])
    idxs = [index(h, w, diag, c) for c in corners_w]
    min_x = int(np.clip(min(i for i, _ in idxs), 0, w - 1))
    max_x = int(np.clip(max(i for i, _ in idxs), 0, w - 1))
    min_y = int(np.clip(min(j for _, j in idxs), 0, h - 1))
    max_y = int(np.clip(max(j for _, j in idxs), 0, h - 1))

    ratio = diag / np.sqrt(float(w) * w + float(h) * h)
    ratio_r = 1.0 / ratio
    delta = (m_inv @ np.array([0.5, 0.5, 0.0, ratio_r]))[:2]
    m2 = m_inv[:2, :2]

    T = 0
    C = 0
    hits = []
    for px in range(min_x, max_x + 1):
        for py in range(min_y, max_y + 1):
            if at(cloud_mask, px, py):
                continue
            q = m2 @ np.array([float(px), float(py)]) + delta
            qi, qj = int(q[0]), int(q[1])  # trunc toward zero
            if not (0 <= qi < w and 0 <= qj < h):
                continue
            if at(cloud_map, qi, qj) != cloud_id:
                continue
            T += 1
            if at(potential_shadow, px, py):
                C += 1
                hits.append((px, py))
    if T < 5:
        return -1.1, [], (min_x, min_y, max_x, max_y)
    return float(np.float32(C) / np.float32(T)), hits, (min_x, min_y, max_x, max_y)


def cast_transform_oracle(quad_corners, height, sun_pos, view_pos):
    """perspective(view, z-plane) ∘ perspective(sun, ground) + affine fit
    (CloudShadowMatching.cpp:139-144)."""
    casted = []
    for c in quad_corners:
        d = view_pos - c
        t = (height - c[2]) / d[2]
        p1 = c + d * t
        d2 = sun_pos - p1
        t2 = -p1[2] / d2[2]
        casted.append(p1 + d2 * t2)
    x1 = np.concatenate([np.asarray(quad_corners).T, np.ones((1, 4))])
    x2 = np.concatenate([np.asarray(casted).T, np.ones((1, 4))])
    m = x2 @ np.linalg.pinv(x1)
    m[2, 2] = 1.0
    return m


def beta_contribution_oracle(
    shadow_pixels, m, clp, diag, area_correction=2.2567583341910251
):
    """Literal port of one shadow's BetaMap contribution
    (ProbabilityRefinement.cpp:46-104). Returns a full-size flipped array."""
    h, w = clp.shape
    ret = np.zeros((h, w), dtype=np.float32)
    if not shadow_pixels:
        return ret
    m_inv = np.linalg.inv(m)
    xs = [p[0] for p in shadow_pixels]
    ys = [p[1] for p in shadow_pixels]
    bx0, bx1, by0, by1 = min(xs), max(xs), min(ys), max(ys)
    area = len(shadow_pixels)
    inf_f = float(np.clip(np.float32(area_correction) * np.sqrt(np.float32(area)), 5.0, 80.0))
    inf_i = int(np.floor(inf_f))

    pixel_set = set(shadow_pixels)
    # border (Functions::border)
    border = []
    for (x, y) in shadow_pixels:
        up = (x, min(y + 1, by1)) in pixel_set
        down = (x, max(y - 1, by0)) in pixel_set
        left = (max(x - 1, bx0), y) in pixel_set
        right = (min(x + 1, bx1), y) in pixel_set
        edge = x == bx0 or y == by0 or x == bx1 or y == by1
        if not (up and down and left and right) or edge:
            border.append((x, y))

    ib_x0 = int(np.clip(bx0 - inf_i, 0, w - 1))
    ib_y0 = int(np.clip(by0 - inf_i, 0, h - 1))
    ib_x1 = int(np.clip(bx1 + inf_i, 0, w - 1))
    ib_y1 = int(np.clip(by1 + inf_i, 0, h - 1))

    def qrb(d, lo, hi, percent):
        a = percent * hi + (1 - percent) * lo
        if d <= lo:
            return 1.0
        if d <= a:
            return 1.0 - (d - lo) ** 2 / ((hi - lo) ** 2 * percent)
        if d <= hi:
            return (d - hi) ** 2 / ((hi - lo) ** 2 * (1 - percent))
        return 0.0

    for i in range(ib_x0, ib_x1 + 1):
        for j in range(ib_y0, ib_y1 + 1):
            if (i, j) in pixel_set:
                d = 0.0
            else:
                d = min(np.sqrt((bx - i) ** 2 + (by - j) ** 2) for (bx, by) in border)
            if d > inf_f:
                continue
            factor = qrb(d, inf_f * 0.15, inf_f, 0.2)
            world = pos(h, w, diag, i, j)
            back = (m_inv @ np.array([world[0], world[1], world[2], 1.0]))[:3]
            ci, cj = index(h, w, diag, back)
            if not (0 <= ci < w and 0 <= cj < h):
                continue
            clp_v = at(clp, ci, cj)
            v = ret[h - 1 - j, i]
            ret[h - 1 - j, i] = max(clp_v * factor, v)
    return ret
