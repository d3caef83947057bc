"""Autograd warp-field optimization (reference GraphFit, super/deform_mesh.py).

The reference's default solver: the deformation ``deform_verts`` in
R^{(J+1) x 7} (last row = global rigid transform T_g, deform_mesh.py:268-270)
is fit by SGD (momentum 0.9) or Adam on the autograd faces of the losses:

- point-plane ICP (DataLoss.autograd_forward, loss.py:292-401) with optional
  hard/soft semantic weighting and Huber-style reweighting,
- ARAP with knn_w weighting (loss.py:457-473),
- Rot over all rows incl. T_g (loss.py:501-505),
- triangle face-area preservation (deform_mesh.py:51-60),
- (render / sf_corr / bn_morph faces live in super_tpu.core.semantic and
  super_tpu.render integrations).

TPU notes: the per-surfel data term streams through the same chunked scans
as the LM path; ``jax.grad`` differentiates through the scan; the T_g row's
gradient is scaled by 1/J before the update (deform_mesh.py:326).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from super_tpu.config import SuPerConfig
from super_tpu.core.losses import LMContext, _chunk_xs, _chunk_view, \
    _cost_chunk_size
from super_tpu.core.state import FrameData, GraphState, SurfelState
from super_tpu.geometry.camera import Intrinsics, project_points
from super_tpu.geometry.divergence import jsd
from super_tpu.geometry.quaternion import blend_warp, transform_quat_t
from super_tpu.ops.bilinear import bilinear_sample_two, bilinear_sample_indexed


class AutogradContext(NamedTuple):
    """Frame constants for the autograd fit (built via prepare_lm's scatter
    mode + semantic extras)."""

    base: LMContext
    sf_seg: jnp.ndarray        # (Np,) int32
    sf_seg_conf: jnp.ndarray   # (C, Np)
    sf_colors: jnp.ndarray     # (3, Np)
    trg_seg_conf: jnp.ndarray  # (C, P)
    num_active_nodes: jnp.ndarray  # ()
    extras: Optional["SemanticExtras"]
    trg_bank_zx: Optional[jnp.ndarray] = None  # ((4+C)*4, P) z-bank with
    #   per-corner seg-conf rows (ops/bilinear.py:build_corner_bank_zx):
    #   the data term's point/normal/conf sample is then ONE gather


def prepare_autograd(cfg: SuPerConfig, surfels: SurfelState,
                     graph: GraphState, frame: FrameData,
                     flow=None, intr=None) -> AutogradContext:
    from super_tpu.core.losses import prepare_lm
    from super_tpu.core.semantic import SemanticExtras, build_semantic_extras
    from super_tpu.core.state import gather_rows

    # Tuple layout (the LM path's): the per-iteration warp then fetches
    # deform by TUPLE broadcast instead of a per-surfel (K, Np)-index
    # gather, whose autograd VJP is a ~1.6M-update conflict scatter-add
    # into (J, 7) -- the round-4 semantic path's dominant cost (~half the
    # frame).  The tuple mode permutes the surfel dim into padded
    # tuple-sorted slots, so the per-surfel extras permute along with it.
    base = prepare_lm(cfg, surfels, graph, frame)
    sf_seg, sf_seg_conf, sf_colors = (surfels.seg, surfels.seg_conf,
                                      surfels.colors)
    if base.layout is not None:
        fdt = surfels.points.dtype
        ebank = jnp.concatenate([
            sf_seg.astype(fdt)[None], sf_seg_conf, sf_colors])
        packed = gather_rows(gather_rows(ebank, base.layout.sort_perm),
                             base.layout.src_pos)
        c = sf_seg_conf.shape[0]
        sf_seg = packed[0].astype(jnp.int32)
        sf_seg_conf = packed[1:1 + c]
        sf_colors = packed[1 + c:4 + c]
    losses = cfg.losses
    extras = None
    if losses.sf_bn_morph or losses.render_loss or losses.sf_corr:
        h, w = cfg.height, cfg.width
        src_uv = None
        if flow is not None:
            # Per-frame flow: anchor the corr match at the source
            # (pre-deformation) projections (semantic.corr_loss deviation
            # 2).  base.sf_points is the (possibly permuted) surfel order
            # every per-surfel array of this context lives in.
            from super_tpu.geometry.camera import project_points

            v0, u0, _, _ = project_points(base.sf_points, intr, h, w)
            src_uv = jnp.stack([u0, v0])
        extras = build_semantic_extras(
            cfg, frame.seg.reshape(h, w),
            frame.seg_conf.reshape(-1, h, w),
            frame.color_image, flow=flow, src_uv=src_uv)
    bank_zx = None
    if losses.sf_hard_seg_point_plane or losses.sf_soft_seg_point_plane:
        from super_tpu.ops.bilinear import build_corner_bank_zx

        h, w = cfg.height, cfg.width
        bank_zx = build_corner_bank_zx(
            frame.points, frame.norms, frame.seg_conf,
            frame.index_map(h, w))
    return AutogradContext(
        base=base,
        sf_seg=sf_seg,
        sf_seg_conf=sf_seg_conf,
        sf_colors=sf_colors,
        trg_seg_conf=frame.seg_conf,
        num_active_nodes=jnp.maximum(graph.num_active, 1),
        extras=extras,
        trg_bank_zx=bank_zx,
    )


def _warp_all(cfg, ctx: LMContext, deform):
    """deform_source parity (deform_mesh.py:198-230): per-node blend warp
    then the full global transform.  Returns warped surfels feature-major
    (3, Np), in ctx's surfel order.

    Tuple layout (default): deform is fetched once per anchor tuple and
    broadcast per G-block (losses._beta_fm_of) -- under ``jax.grad`` the
    broadcast's VJP is a dense per-block reduction plus a tiny
    (T, K, 7)-index scatter, replacing the per-surfel gather whose VJP is
    a ~1.6M-update conflict scatter-add into (J, 7) (~55 ms/iteration at
    480p by the measured ~5 ns/element scatter cost)."""
    from super_tpu.core.losses import _beta_fm_of, _geom_of, _warp_fm_batched

    node_beta = deform[:-1]
    t_g = deform[-1]
    chunk = _cost_chunk_size(cfg, ctx)
    xs, nc = _chunk_xs(ctx, chunk)
    beta_t = (node_beta[ctx.layout.tuple_nodes]
              if ctx.layout is not None else None)

    def one(xs_elem):
        if beta_t is not None:
            mask_c, w_fm, knn_fm, diff_fm = _geom_of(ctx, xs_elem)
            beta_kfm = _beta_fm_of(beta_t, xs_elem)
            tp = _warp_fm_batched(w_fm, knn_fm, diff_fm, beta_kfm)  # (3, C)
            warped = transform_quat_t(tp.T, t_g[0:4]) + t_g[4:7]
            return warped.T
        cv = _chunk_view(xs_elem)
        warped = blend_warp(cv.diff, cv.knn, node_beta[cv.knn_idx], cv.knn_w)
        warped = transform_quat_t(warped, t_g[0:4]) + t_g[4:7]
        return warped.T  # (3, C)

    # Rematerialize the chunk body under reverse-mode AD: the warp's
    # (3K, C) intermediates (cross products, rotated stacks) would
    # otherwise be SAVED to HBM per chunk in the forward and re-read in
    # the backward; recomputing them costs flops the VPU has to spare.
    one = jax.checkpoint(one)
    if nc == 1:
        return one(jax.tree.map(lambda a: a[0], xs))
    _, ys = jax.lax.scan(lambda c, x: (c, one(x)), None, xs)
    return jnp.moveaxis(ys, 0, 1).reshape(3, -1)


def point_plane_autograd(cfg: SuPerConfig, ctx: AutogradContext, deform,
                         intr: Intrinsics, warped=None):
    """DataLoss.autograd_forward point-plane mode (loss.py:292-401).

    Optional semantic weighting: hard (same-class indicator) or soft
    (exp(-0.1 JSD) between source confs and the softmaxed sampled target
    confs), combined geometrically; weights are stop-gradiented like the
    reference's .detach().
    """
    base = ctx.base
    losses = cfg.losses
    seg_icp = losses.sf_hard_seg_point_plane or losses.sf_soft_seg_point_plane
    if warped is None:
        warped = _warp_all(cfg, base, deform)   # (3, Np)
    h, w = cfg.height, cfg.width
    v, u, _, valid = project_points(warped, intr, h, w, valid_margin=1)
    mask = base.sf_mask & valid

    tconf_fm = None
    if seg_icp and ctx.trg_bank_zx is not None:
        # ONE (4+C)*4-row z-bank gather for points + normals + seg confs
        # (value-equal to the index-map samplers at valid queries; the
        # 12-gather-indices-per-surfel path cost ~3x the whole sample).
        from super_tpu.ops.bilinear import bilinear_sample_bank_zx_fm

        c = ctx.trg_seg_conf.shape[0]
        o_fm, n_fm, tconf_fm, svalid = bilinear_sample_bank_zx_fm(
            ctx.trg_bank_zx, c, intr, h, w, v, u)
        o, n = o_fm.T, n_fm.T
    else:
        from super_tpu.ops.bilinear import bilinear_sample_bank_z

        o, n, svalid, _, _ = bilinear_sample_bank_z(
            base.trg_corner_bank, intr, h, w, v, u)
    mask = mask & svalid
    r = jnp.sum(n * (warped.T - o), axis=-1)
    sq = jnp.where(mask, r * r, 0.0)

    # Residual clipping (deform_mesh.py:95 raft mode) -- drop huge residuals.
    if losses.sf_point_plane_max > 0:
        sq = jnp.where(jax.lax.stop_gradient(sq) < losses.sf_point_plane_max,
                       sq, 0.0)
    # Huber-style reweighting (loss.py:374-377), detached.
    if losses.huber_th > 0:
        hw = jnp.minimum(
            losses.huber_th / jnp.exp(jnp.abs(sq) + 1e-20), 1.0)
        sq = sq * jax.lax.stop_gradient(hw)

    weights = None
    if seg_icp:
        if tconf_fm is not None:
            tconf, cvalid = tconf_fm.T, svalid
        else:
            tconf, cvalid, _ = bilinear_sample_indexed(
                ctx.trg_seg_conf, base.trg_index_map, v, u)   # (Np, C)
        tconf = jax.nn.softmax(tconf, axis=-1)
        if losses.sf_soft_seg_point_plane:
            div = jsd(ctx.sf_seg_conf.T, tconf)
            weights = jnp.exp(-0.1 * div)
        else:
            t_seg = jnp.argmax(tconf, axis=-1)
            weights = (ctx.sf_seg == t_seg).astype(sq.dtype)
        weights = jax.lax.stop_gradient(jnp.where(mask & cvalid, weights, 0.0))
    if weights is not None:
        sq = sq * weights
    return jnp.sum(sq)


def arap_autograd(graph: GraphState, ctx: LMContext, deform):
    """knn_w-weighted ARAP (ARAPLoss.autograd_forward, loss.py:457-473)."""
    beta = deform[:-1]
    nb = beta[ctx.ed_knn_idx]
    r = transform_quat_t(ctx.d_eds, nb)
    r = r - ctx.d_eds - beta[:, None, 4:7]
    r = jnp.where(ctx.ed_pair_mask[..., None], r, 0.0)
    return jnp.sum(graph.knn_w * jnp.sum(r * r, axis=-1))


def rot_autograd(deform, active):
    """(1 - |q|^2)^2 over node rows + the global row (loss.py:501-505)."""
    q = deform[:, 0:4]
    r = 1.0 - jnp.sum(q * q, axis=-1)
    gate = jnp.concatenate([active, jnp.ones((1,), dtype=bool)])
    return jnp.sum(jnp.where(gate, r * r, 0.0))


def face_autograd(graph: GraphState, deform):
    """Triangle-area preservation (deform_mesh.py:51-60), on warped nodes."""
    beta = deform[:-1]
    t_g = deform[-1]
    new_nodes = graph.points + beta[:, 4:7]
    new_nodes = transform_quat_t(new_nodes, t_g[0:4]) + t_g[4:7]
    t = graph.triangles
    cross = jnp.cross(new_nodes[t[:, 1]] - new_nodes[t[:, 0]],
                      new_nodes[t[:, 2]] - new_nodes[t[:, 0]])
    areas = 0.5 * jnp.sqrt(jnp.sum(cross * cross, axis=1) + 1e-13)
    d = jnp.where(graph.tri_active, areas - graph.tri_areas, 0.0)
    return jnp.sum(d * d)


def autograd_total(cfg: SuPerConfig, ctx: AutogradContext,
                   graph: GraphState, deform, intr: Intrinsics,
                   flow_fn=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum of enabled autograd losses (GraphFit.get_losses,
    deform_mesh.py:25-196; render/corr/morph faces integrate separately).

    ``flow_fn``: optional (3, H, W) render -> (2, H, W) flow; when given
    (sf_corr_match_renderimg, deform_mesh.py:294-305) the corr loss re-runs
    optical flow on the current soft render each evaluation instead of the
    per-frame flow in ``ctx.extras.flow``."""
    losses = cfg.losses
    parts = {}
    total = jnp.asarray(0.0, jnp.float32)
    seg_icp = losses.sf_hard_seg_point_plane or losses.sf_soft_seg_point_plane
    need_warp = (losses.sf_point_plane or seg_icp or losses.sf_bn_morph
                 or losses.render_loss or losses.sf_corr)
    warped = _warp_all(cfg, ctx.base, deform) if need_warp else None

    if losses.sf_point_plane or seg_icp:
        parts["point_plane"] = losses.sf_point_plane_weight * \
            point_plane_autograd(cfg, ctx, deform, intr, warped=warped)
        total = total + parts["point_plane"]
    if losses.mesh_arap:
        parts["arap"] = losses.mesh_arap_weight * arap_autograd(
            graph, ctx.base, deform)
        total = total + parts["arap"]
    if losses.mesh_rot:
        parts["rot"] = losses.mesh_rot_weight * rot_autograd(
            deform, ctx.base.ed_mask)
        total = total + parts["rot"]
    if losses.mesh_face:
        parts["face"] = losses.mesh_face_weight * face_autograd(graph, deform)
        total = total + parts["face"]

    if ctx.extras is not None:
        from super_tpu.core import semantic as sem
        from super_tpu.render.splat import render_soft

        if losses.sf_bn_morph:
            parts["bn_morph"] = losses.sf_bn_morph_weight * sem.bn_morph_loss(
                cfg, ctx.extras, warped, ctx.sf_seg, ctx.base.sf_mask, intr)
            total = total + parts["bn_morph"]
        need_render = losses.render_loss or (losses.sf_corr
                                             and flow_fn is not None)
        if need_render:
            rendered = render_soft(warped, ctx.sf_colors, ctx.base.sf_mask,
                                   intr, cfg.height, cfg.width)
        if losses.render_loss:
            parts["render"] = losses.render_loss_weight * sem.render_loss(
                cfg, ctx.extras, rendered)
            total = total + parts["render"]
        if losses.sf_corr:
            extras = ctx.extras
            if flow_fn is not None:
                extras = extras._replace(flow=flow_fn(rendered))
            parts["corr"] = losses.sf_corr_weight * sem.corr_loss(
                cfg, extras, warped, ctx.base.trg_points,
                ctx.base.trg_norms, ctx.base.trg_index_map,
                ctx.base.sf_mask, intr,
                loss_type=losses.sf_corr_loss_type)
            total = total + parts["corr"]
    return total, parts


def graph_fit(cfg: SuPerConfig, surfels: SurfelState, graph: GraphState,
              frame: FrameData, intr: Intrinsics, models=None,
              prev_color=None):
    """Run the autograd fit; returns (deform (J+1, 7), final loss).

    Parity: GraphFit.deform_superedg (deform_mesh.py:251-378): Niter steps
    of SGD(momentum 0.9)/Adam with the T_g gradient scaled by 1/J.

    sf_corr flow plumbing (deform_mesh.py:294-311): with a flow model in
    ``models``, the flow is inferred ONCE per frame from the previous
    frame's color (``prev_color``, the reference's src.rgb) to the current
    frame -- or, with ``sf_corr_match_renderimg``, re-inferred every
    iteration from the current soft render.  Flow is stop-gradiented like
    the reference's .detach() (deform_mesh.py:19-23).
    """
    losses = cfg.losses
    flow0 = None
    flow_fn = None
    if (losses.sf_corr and models is not None
            and getattr(models, "flow_model", None) is not None):
        fm, fp = models.flow_model, models.flow_params

        def infer(src_chw, trg_chw):
            fl = fm.apply(fp, src_chw.transpose(1, 2, 0)[None],
                          trg_chw.transpose(1, 2, 0)[None])[0]  # (H, W, 2)
            return jax.lax.stop_gradient(fl.transpose(2, 0, 1))

        if losses.sf_corr_match_renderimg:
            flow_fn = lambda rendered: infer(rendered, frame.color_image)  # noqa: E731
        elif prev_color is not None:
            flow0 = infer(prev_color, frame.color_image)
    ctx = prepare_autograd(cfg, surfels, graph, frame, flow=flow0, intr=intr)
    j_cap = graph.capacity
    deform0 = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)[None],
                       (j_cap + 1, 1))

    if cfg.solver.optimizer == "Adam":
        opt = optax.adam(cfg.solver.learning_rate)
    else:
        opt = optax.sgd(cfg.solver.learning_rate, momentum=0.9)
    opt_state0 = opt.init(deform0)

    loss_fn = lambda d: autograd_total(cfg, ctx, graph, d, intr,  # noqa: E731
                                       flow_fn=flow_fn)[0]
    grad_fn = jax.value_and_grad(loss_fn)

    def body(_, carry):
        deform, opt_state, _ = carry
        loss, grads = grad_fn(deform)
        grads = grads.at[-1].set(grads[-1] / ctx.num_active_nodes)
        updates, opt_state = opt.update(grads, opt_state, deform)
        deform = optax.apply_updates(deform, updates)
        return deform, opt_state, loss

    deform, _, loss = jax.lax.fori_loop(
        0, cfg.solver.num_iterations, body,
        (deform0, opt_state0, jnp.asarray(0.0, jnp.float32)))
    return deform, loss
