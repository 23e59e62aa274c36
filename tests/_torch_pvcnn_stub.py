"""Pure-torch CPU emulation of the reference's CUDA pvcnn functional ops.

Installed into ``sys.modules`` as ``third_party.pvcnn.functional`` so the
REAL reference torch models (models/latent_points_ada.py,
models/vae_adain.py, models/latent_points_ada_localprior.py) build and
run on CPU for full-model forward-parity tests (VERDICT r3 item 2).

Each function reproduces the corresponding CUDA kernel's semantics
exactly (citations into /root/reference):

- avg_voxelize: sum/count scatter-mean, idx = x*r^2 + y*r + z
  (third_party/pvcnn/functional/src/voxelization/vox.cu:18-72)
- trilinear_devoxelize: floor corners; hi corner collapses onto lo
  when frac == 0 (src/interpolate/trilinear_devox.cu:41-76)
- furthest_point_sample: seeds index 0, iterative farthest-argmax
  (src/sampling/sampling.cu:86-167)
- ball_query: first <=u points with d^2 < r^2; empty -> 0-fill,
  partial -> first-hit fill (src/ball_query/ball_query.cu:33-48)
- grouping / gather: index gathers (src/grouping/grouping.cu:18-36,
  src/sampling/sampling.cu:17-74)
- nearest_neighbor_interpolate: exact 3-NN (strict <, earliest index
  on ties), distances clamped to [1e-10, 1e10], IDW weights
  (src/interpolate/neighbor_interpolate.cu:32-76)
"""
import torch

__all__ = [
    "ball_query", "trilinear_devoxelize", "grouping",
    "nearest_neighbor_interpolate", "kl_loss", "huber_loss",
    "gather", "furthest_point_sample", "logits_mask", "avg_voxelize",
]


def avg_voxelize(features, coords, resolution):
    """features [B, C, N] float, coords [B, 3, N] int -> [B, C, R, R, R]."""
    b, c, n = features.shape
    r = resolution
    features = features.float()
    coords = coords.int()[:, :3]
    idx = (coords[:, 0].long() * r + coords[:, 1].long()) * r \
        + coords[:, 2].long()                                # (B, N)
    out = features.new_zeros(b, c, r * r * r)
    cnt = features.new_zeros(b, 1, r * r * r)
    out.scatter_add_(2, idx[:, None, :].expand(b, c, n), features)
    cnt.scatter_add_(2, idx[:, None, :], features.new_ones(b, 1, n))
    out = out / cnt.clamp(min=1.0)
    return out.view(b, c, r, r, r)


def trilinear_devoxelize(features, coords, resolution, is_training=True):
    """features [B, C, R, R, R], coords float [B, 3, N] -> [B, C, N]."""
    b, c = features.shape[:2]
    r = resolution
    f = features.contiguous().view(b, c, -1).float()
    xyz = coords[:, :3].float()
    lo = torch.floor(xyz)
    frac = xyz - lo                                          # (B, 3, N)
    lo = lo.long()
    # hi collapses onto lo when frac == 0 (weight there is 0 anyway)
    hi = lo + (frac > 0).long()
    w1, w0 = frac, 1.0 - frac
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = (hi if dx else lo)[:, 0]
                iy = (hi if dy else lo)[:, 1]
                iz = (hi if dz else lo)[:, 2]
                idx = (ix * r + iy) * r + iz                 # (B, N)
                w = (w1 if dx else w0)[:, 0] * \
                    (w1 if dy else w0)[:, 1] * \
                    (w1 if dz else w0)[:, 2]                 # (B, N)
                g = torch.gather(
                    f, 2, idx[:, None, :].expand(b, c, idx.shape[1]))
                out = out + w[:, None, :] * g
    return out


def gather(features, indices):
    """features [B, C, N], indices [B, M] -> [B, C, M]."""
    b, c, _ = features.shape
    idx = indices.long()[:, None, :].expand(b, c, indices.shape[1])
    return torch.gather(features, 2, idx)


def furthest_point_sample(coords, num_samples, normals=None):
    """coords [B, 3, N] -> sampled coords [B, 3, M]; seeds index 0."""
    b, _, n = coords.shape
    xyz = coords[:, :3].float()
    indices = torch.zeros(b, num_samples, dtype=torch.long)
    dist = torch.full((b, n), 1e38)
    last = torch.zeros(b, dtype=torch.long)
    for j in range(1, num_samples):
        ref = torch.stack([xyz[i, :, last[i]] for i in range(b)])  # (B, 3)
        d = ((xyz - ref[:, :, None]) ** 2).sum(1)            # (B, N)
        dist = torch.minimum(dist, d)
        last = dist.argmax(1)
        indices[:, j] = last
    out = gather(coords, indices)
    if normals is not None:
        return out, gather(normals, indices)
    return out


def ball_query(centers_coords, points_coords, radius, num_neighbors):
    """centers [B, 3, M], points [B, 3, N] -> int [B, M, U]."""
    centers = centers_coords[:, :3].float()
    points = points_coords[:, :3].float()
    b, _, m = centers.shape
    n = points.shape[2]
    u = num_neighbors
    d2 = ((centers[:, :, :, None] - points[:, :, None, :]) ** 2).sum(1)
    hit = d2 < radius * radius                               # (B, M, N)
    rank = hit.long().cumsum(-1) - 1                         # rank among hits
    any_hit = hit.any(-1)                                    # (B, M)
    ar = torch.arange(n)[None, None, :].expand(b, m, n)
    first = torch.where(hit, ar, n).amin(-1).clamp(max=n - 1)
    out = first[:, :, None].expand(b, m, u).contiguous()     # first-hit fill
    valid = hit & (rank < u)
    bi, mi, ki = valid.nonzero(as_tuple=True)
    out[bi, mi, rank[bi, mi, ki]] = ki
    out = out * any_hit[:, :, None].long()                   # empty -> 0
    return out.int()


def grouping(features, indices):
    """features [B, C, N], indices [B, M, U] -> [B, C, M, U]."""
    b, c, _ = features.shape
    _, m, u = indices.shape
    idx = indices.long().view(b, 1, m * u).expand(b, c, m * u)
    return torch.gather(features, 2, idx).view(b, c, m, u)


def nearest_neighbor_interpolate(points_coords, centers_coords,
                                 centers_features):
    """points [B, 3, N], centers [B, 3, M], feats [B, C, M] -> [B, C, N]."""
    points = points_coords[:, :3].float()
    centers = centers_coords[:, :3].float()
    b, c, m = centers_features.shape
    n = points.shape[2]
    d2 = ((points[:, :, :, None] - centers[:, :, None, :]) ** 2).sum(1)
    # strict < scan keeps the EARLIEST index on ties -> stable sort
    order = torch.argsort(d2.double(), dim=2, stable=True)[:, :, :3]
    best = torch.gather(d2, 2, order)                        # (B, N, 3)
    best = best.clamp(min=1e-10, max=1e10)
    d01 = best[..., 0] * best[..., 1]
    d02 = best[..., 0] * best[..., 2]
    d12 = best[..., 1] * best[..., 2]
    denom = 1.0 / (d01 + d02 + d12)
    w = torch.stack([d12 * denom, d02 * denom, d01 * denom], dim=2)
    idx = order.reshape(b, 1, n * 3).expand(b, c, n * 3)
    g = torch.gather(centers_features.float(), 2, idx).view(b, c, n, 3)
    return (g * w[:, None, :, :]).sum(3)


def kl_loss(x, y):  # pragma: no cover - unused by the parity models
    return torch.nn.functional.kl_div(x, y)


def huber_loss(error, delta):  # pragma: no cover - unused
    abs_error = torch.abs(error)
    quadratic = torch.clamp(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def logits_mask(coords, logits, num_points_per_object):  # pragma: no cover
    raise NotImplementedError("logits_mask is unused by LION models")
