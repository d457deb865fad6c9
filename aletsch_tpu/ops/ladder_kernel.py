"""Batched device kernel for the scallop resolution-ladder prefix.

The device form of ops/ladder_ref.py (which is itself the dense spec of
scallop/scallop.cc:47-150 rungs 1-4: resolve_broken_vertex,
resolve_trivial_vertex_fast, resolve_trivial_vertex(1, fast),
resolve_smallest_edges).  A whole wave of graphs runs in lockstep inside
one `lax.while_loop`; each iteration advances every active graph by ONE
event — a single arm fire (decompose / edge removal), one pair of a
trivial-vertex decomposition, or an arm transition — with the scan
portions window-vectorized:

    host semantics: scan vertices ascending, re-evaluating under the
    state mutated by earlier fires in the same pass.  Between two fires
    the state is static, so the whole window [cursor, next-fire) is
    evaluated in one shot; prefix-min masks reproduce the sequential
    best-tracking including its tie rules (later candidate wins on
    equal ratio) and the early-break (ratio < jump_ratio).

All arithmetic is f64 and transcribed operation-for-operation from the
host (ordered adjacency-list sums via per-vertex list matrices, sqrt
balancing, split/merge weight flow, last-min-wins smallest-edge scans),
so on an IEEE-f64 backend the emitted decision log is bit-identical to
the host ladder — the trust-mode contract shared with the fused drain
(ops/greedy_fused.py).  tests/test_ladder_kernel.py fuzzes this kernel
against ladder_ref (and transitively against the Python Scallop).

Status codes per graph: 0 = CLEAN (arms exhausted; the host resumes at
the router rungs), 1 = OVERFLOW (edge-slot / pair / decision-log / list
capacity hit; the host ignores the log and redoes the whole ladder),
2 = still-running at the iteration cap (treated as OVERFLOW by hosts).
"""

from __future__ import annotations

import numpy as np

from .ladder_ref import BROKEN, SMALLEST, TRIVIAL  # noqa: F401 (re-export)

DEFAULT_B = 64
DEFAULT_V = 64
DEFAULT_E = 256
DEFAULT_H = 64
DEFAULT_L = 32
DEFAULT_DMAX = 32
DEFAULT_DLOG = 192

# pc values
PC_BROKEN = 0
PC_FAST = 1
PC_TV1 = 2
PC_SMALL = 3
PC_DECOMP = 4
PC_DONE = 5

ST_RUN = -1
ST_CLEAN = 0
ST_OVERFLOW = 1

INF = np.float64(1e300)
BIGI = np.int32(2 ** 30)

_CACHE = {}


def _build(jax, jnp, B, V, E, H, L, DMAX, DLOG, MAXITER):
    lax = jax.lax
    bi = jnp.arange(B)
    varange = jnp.arange(V, dtype=jnp.int32)
    earange = jnp.arange(E, dtype=jnp.int32)
    lpos = jnp.arange(L, dtype=jnp.int32)

    def seg_tables(esrc, edst, ewrt, esin, esout, ealive, nz, estr, nv):
        """Per-iteration vectorized tables.

        Returns dict with:
          din/dout [B,V] degrees; lin/lout [B,V,DMAX] adjacency-list
          matrices (edge ids in stamp order, -1 pad); inw/outw [B,V]
          ordered f64 sums; strand degree tables; smallest-edge scans;
          deg_over [B] (some list exceeded DMAX).
        """
        alive = ealive
        # one-hot [B,E,V] membership (E*V bools)
        in_m = alive[:, :, None] & (edst[:, :, None] == varange[None, None])
        out_m = alive[:, :, None] & (esrc[:, :, None] == varange[None, None])
        din = jnp.sum(in_m, axis=1).astype(jnp.int32)
        dout = jnp.sum(out_m, axis=1).astype(jnp.int32)
        deg_over = jnp.any(jnp.maximum(din, dout) > DMAX, axis=1)

        # rank of each edge within its (dst, in-stamp) list
        same_in = alive[:, :, None] & alive[:, None, :] \
            & (edst[:, :, None] == edst[:, None, :]) \
            & (esin[:, None, :] < esin[:, :, None])
        rank_in = jnp.sum(same_in, axis=2).astype(jnp.int32)
        same_out = alive[:, :, None] & alive[:, None, :] \
            & (esrc[:, :, None] == esrc[:, None, :]) \
            & (esout[:, None, :] < esout[:, :, None])
        rank_out = jnp.sum(same_out, axis=2).astype(jnp.int32)

        ri = jnp.minimum(rank_in, DMAX - 1)
        ro = jnp.minimum(rank_out, DMAX - 1)
        src_c = jnp.clip(esrc, 0, V - 1)
        dst_c = jnp.clip(edst, 0, V - 1)
        bidx = jnp.broadcast_to(bi[:, None], (B, E))
        # dead edges scatter to the dropped out-of-range row so they can
        # never clobber a live slot
        eid2 = jnp.broadcast_to(earange[None, :], (B, E)).astype(jnp.int32)
        lin = jnp.full((B, V, DMAX), -1, jnp.int32).at[
            jnp.where(alive, bidx, B), dst_c, ri].set(eid2, mode="drop")
        lout = jnp.full((B, V, DMAX), -1, jnp.int32).at[
            jnp.where(alive, bidx, B), src_c, ro].set(eid2, mode="drop")

        def wsum(lst):
            """Ordered f64 sum along the DMAX list axis."""
            def stp(j, acc):
                e = lst[:, :, j]
                ok = e >= 0
                w = ewrt[bi[:, None], jnp.clip(e, 0, E - 1)]
                return acc + jnp.where(ok, w, 0.0)
            return lax.fori_loop(0, DMAX, stp, jnp.zeros((B, V),
                                                         jnp.float64))

        inw = wsum(lin)
        outw = wsum(lout)

        def smallest(lst, degv):
            """Host compute_smallest_{in,out}_edge per vertex: ordered sum
            + last-min-wins scan (scallop.cc:2967-3007)."""
            def stp(j, car):
                minw, e = car
                eid = lst[:, :, j]
                ok = eid >= 0
                w = jnp.where(ok, ewrt[bi[:, None],
                                       jnp.clip(eid, 0, E - 1)], INF)
                upd = ok & (w <= minw)
                return jnp.where(upd, w, minw), jnp.where(upd, eid, e)
            minw, e = lax.fori_loop(
                0, DMAX, stp,
                (jnp.full((B, V), INF), jnp.full((B, V), -1, jnp.int32)))
            return e, minw

        sm_in_e, sm_in_w = smallest(lin, din)
        sm_out_e, sm_out_w = smallest(lout, dout)

        # strand degree tables [B,V,3] per side
        def strdeg(m):
            out = []
            for z in range(3):
                out.append(jnp.sum(m & (estr[:, :, None] == z), axis=1))
            return jnp.stack(out, axis=-1).astype(jnp.int32)
        sin = strdeg(in_m)
        sout = strdeg(out_m)
        mixed = ((sin[:, :, 1] + sout[:, :, 1]) >= 1) \
            & ((sin[:, :, 2] + sout[:, :, 2]) >= 1)

        interior = (varange[None, :] >= 1) & (varange[None, :]
                                              < nv[:, None] - 1)
        return dict(din=din, dout=dout, lin=lin, lout=lout, inw=inw,
                    outw=outw, sm_in_e=sm_in_e, sm_in_w=sm_in_w,
                    sm_out_e=sm_out_e, sm_out_w=sm_out_w, sin=sin,
                    sout=sout, mixed=mixed, interior=interior,
                    deg_over=deg_over)

    # ---------------------------------------------------- hyper primitives

    def h_valid(hlen):
        return lpos[None, None, :] < hlen[:, :, None]          # [B,H,L]

    def hs_remove_mask(hedge, hlen, emask):
        """Remove every edge in emask [B,E]: occurrences -> -1."""
        idx = jnp.clip(hedge, 0, E - 1)
        hit = emask[bi[:, None, None], idx] & (hedge >= 0) & h_valid(hlen)
        return jnp.where(hit, -1, hedge)

    def hs_replace_single(hedge, hlen, x, e):
        """replace_list([x], e): all occurrences of x -> e."""
        hit = (hedge == x[:, None, None]) & h_valid(hlen)
        return jnp.where(hit, e[:, None, None], hedge)

    def hs_replace_pair(hedge, hlen, x, y, e):
        """replace_list([x,y], e): consecutive [x,y] -> [e] (shrinks)."""
        vmask = h_valid(hlen)
        nxt = jnp.concatenate([hedge[:, :, 1:],
                               jnp.full((B, H, 1), -1, jnp.int32)], axis=2)
        nvalid = jnp.concatenate([vmask[:, :, 1:],
                                  jnp.zeros((B, H, 1), bool)], axis=2)
        match = vmask & nvalid & (hedge == x[:, None, None]) \
            & (nxt == y[:, None, None])
        he = jnp.where(match, e[:, None, None], hedge)
        # delete the slot after each match
        del_m = jnp.concatenate([jnp.zeros((B, H, 1), bool),
                                 match[:, :, :-1]], axis=2) & vmask
        keep = vmask & ~del_m
        key = jnp.where(keep, lpos[None, None, :], BIGI)
        order = jnp.argsort(key, axis=2)
        gathered = jnp.take_along_axis(he, order, axis=2)
        nkeep = jnp.sum(keep, axis=2).astype(jnp.int32)
        he2 = jnp.where(lpos[None, None, :] < nkeep[:, :, None],
                        gathered, -1)
        return he2, nkeep

    def pair_code(a, b):
        return (a + 2) * (E + 2) + (b + 2)

    def dominates(hedge, hlen, ec, right):
        """left/right_dominate for candidate edges ec [B,C] (C=V).
        hyper_set.cc:1003-1082; right=True mirrors the scan direction."""
        C = ec.shape[1]
        vmask = h_valid(hlen)                                   # [B,H,L]
        if right:
            hedge = hedge[:, :, ::-1]
            vmask = vmask[:, :, ::-1]
            # valid slots are now right-aligned; shift them left-aligned
            # by sorting valid-first while preserving order
            key = jnp.where(vmask, lpos[None, None, :], BIGI)
            order = jnp.argsort(key, axis=2)
            hedge = jnp.take_along_axis(hedge, order, axis=2)
            ln = jnp.sum(vmask, axis=2).astype(jnp.int32)
            vmask = lpos[None, None, :] < ln[:, :, None]
        occ = vmask[:, None] & (hedge[:, None] == ec[:, :, None, None])
        nxt1 = jnp.concatenate([hedge[:, :, 1:],
                                jnp.full((B, H, 1), -1, jnp.int32)], axis=2)
        nv1 = jnp.concatenate([vmask[:, :, 1:],
                               jnp.zeros((B, H, 1), bool)], axis=2)
        nxt2 = jnp.concatenate([hedge[:, :, 2:],
                                jnp.full((B, H, 2), -1, jnp.int32)], axis=2)
        nv2 = jnp.concatenate([vmask[:, :, 2:],
                               jnp.zeros((B, H, 2), bool)], axis=2)
        prv = jnp.concatenate([jnp.full((B, H, 1), -1, jnp.int32),
                               hedge[:, :, :-1]], axis=2)
        pv = jnp.concatenate([jnp.zeros((B, H, 1), bool),
                              vmask[:, :, :-1]], axis=2)
        has_next = occ & nv1[:, None] & (nxt1[:, None] != -1)
        is_start = ~pv[:, None] | (prv[:, None] == -1)
        n1 = jnp.broadcast_to(nxt1[:, None], has_next.shape)
        n2 = jnp.where(jnp.broadcast_to(nv2[:, None], has_next.shape),
                       jnp.broadcast_to(nxt2[:, None], has_next.shape), -1)
        x1m = has_next & is_start
        x2m = has_next & ~is_start
        SENT = jnp.int32((E + 2) * (E + 2) + 7)
        c_x1 = jnp.where(x1m, pair_code(n1, n2), SENT)
        c_x2a = jnp.where(x2m, pair_code(n1, jnp.int32(-1)), SENT)
        c_x2b = jnp.where(x2m, pair_code(n1, n2), SENT)
        c_x1 = c_x1.reshape(B, C, H * L)
        c_x2 = jnp.concatenate([c_x2a.reshape(B, C, H * L),
                                c_x2b.reshape(B, C, H * L)], axis=2)
        x2s = jnp.sort(c_x2, axis=2)
        posn = jax.vmap(jnp.searchsorted)(
            x2s.reshape(B * C, 2 * H * L),
            c_x1.reshape(B * C, H * L)).reshape(B, C, H * L)
        found = jnp.take_along_axis(
            x2s, jnp.clip(posn, 0, 2 * H * L - 1), axis=2) == c_x1
        ok = jnp.all((c_x1 == SENT) | found, axis=2)            # x1 <= x2
        return ok

    def extends(hedge, hlen, ec):
        """(left_extend, right_extend) for candidate edges ec [B,C]."""
        vmask = h_valid(hlen)
        occ = vmask[:, None] & (hedge[:, None] == ec[:, :, None, None])
        prv = jnp.concatenate([jnp.full((B, H, 1), -1, jnp.int32),
                               hedge[:, :, :-1]], axis=2)
        pv = jnp.concatenate([jnp.zeros((B, H, 1), bool),
                              vmask[:, :, :-1]], axis=2)
        nxt = jnp.concatenate([hedge[:, :, 1:],
                               jnp.full((B, H, 1), -1, jnp.int32)], axis=2)
        nvv = jnp.concatenate([vmask[:, :, 1:],
                               jnp.zeros((B, H, 1), bool)], axis=2)
        le = jnp.any(occ & pv[:, None] & (prv[:, None] != -1),
                     axis=(2, 3))
        re = jnp.any(occ & nvv[:, None] & (nxt[:, None] != -1),
                     axis=(2, 3))
        return le, re

    # -------------------------------------------------------------- kernel

    def ladder(esrc, edst, ewrt, estr, esin, esout, ealive, nedges,
               nstamp, nz, hedge, hlen, nv, jump, smallr, guard, smin):
        pc0 = jnp.where(nv > 0, PC_BROKEN, PC_DONE).astype(jnp.int32)
        st0 = (
            esrc, edst, ewrt, estr, esin, esout, ealive, nedges, nstamp,
            nz, hedge, hlen,
            pc0,                                     # pc
            jnp.ones(B, jnp.int32),                  # cur
            jnp.zeros(B, bool),                      # fired (pass flag)
            jnp.full(B, INF),                        # tv best ratio
            jnp.full(B, -1, jnp.int32),              # tv best root
            smallr.astype(jnp.float64),              # sm best ratio
            jnp.full(B, -1, jnp.int32),              # sm best edge
            jnp.full(B, -1, jnp.int32),              # droot
            jnp.full((B, DMAX), -1, jnp.int32),      # dp_e1 (sorted order)
            jnp.full((B, DMAX), -1, jnp.int32),      # dp_e2
            jnp.zeros((B, DMAX), jnp.float64),       # dp_w
            jnp.zeros(B, jnp.int32),                 # dp_n
            jnp.zeros(B, jnp.int32),                 # dp_k
            jnp.zeros(B, jnp.int32),                 # dp_m_single (npairs)
            jnp.zeros(B, jnp.int32),                 # dside (0: e1 single)
            jnp.zeros(B, jnp.int32),                 # dret pc
            jnp.ones(B, jnp.int32),                  # dret cur
            jnp.zeros((B, DLOG), jnp.int32),         # log arm
            jnp.zeros((B, DLOG), jnp.int32),         # log tgt
            jnp.zeros(B, jnp.int32),                 # ndec
            jnp.where(nv > 0, ST_RUN,
                      ST_CLEAN).astype(jnp.int32),   # status
            jnp.int32(0),                            # it
        )

        def cond(st):
            pc = st[12]
            it = st[-1]
            return jnp.any(pc != PC_DONE) & (it < MAXITER)

        def body(st):
            (esrc, edst, ewrt, estr, esin, esout, ealive, nedges, nstamp,
             nz, hedge, hlen, pc, cur, fired, tvr, tvroot, smr, sme,
             droot, dp_e1, dp_e2, dp_w, dp_n, dp_k, dp_ms, dside,
             dret, dretc, larm, ltgt, ndec, status, it) = st

            t = seg_tables(esrc, edst, ewrt, esin, esout, ealive, nz,
                           estr, nv)
            din, dout = t["din"], t["dout"]
            active_v = t["interior"] & nz
            # arm masks snapshot pc at iteration start: a transition takes
            # effect NEXT iteration, so the heavy-table gating (dominates /
            # extends on the start-pc) can never starve a scan that chained
            # in mid-body
            pc0 = pc

            def logd(larm, ltgt, ndec, mask, arm, tgt):
                """Append a decision for masked graphs."""
                slot = jnp.clip(ndec, 0, DLOG - 1)
                la = larm.at[bi, slot].set(
                    jnp.where(mask, arm, larm[bi, slot]))
                lt = ltgt.at[bi, slot].set(
                    jnp.where(mask, tgt, ltgt[bi, slot]))
                nd = ndec + mask.astype(jnp.int32)
                over = mask & (nd > DLOG)
                return la, lt, nd, over

            # ---------------- common candidate predicates (current state)
            # balance ratio per vertex (host compute_balance_ratio)
            w1, w2 = t["inw"], t["outw"]
            bal_r = jnp.where(w1 >= w2,
                              w1 / jnp.where(w2 == 0.0, 1.0, w2),
                              w2 / jnp.where(w1 == 0.0, 1.0, w1))
            head_in = t["lin"][:, :, 0]
            head_out = t["lout"][:, :, 0]
            hi_c = jnp.clip(head_in, 0, E - 1)
            ho_c = jnp.clip(head_out, 0, E - 1)
            src_of_hi = esrc[bi[:, None], hi_c]
            dst_of_ho = edst[bi[:, None], ho_c]
            outdeg_src = dout[bi[:, None], jnp.clip(src_of_hi, 0, V - 1)]
            indeg_dst = din[bi[:, None], jnp.clip(dst_of_ho, 0, V - 1)]
            d1_is1 = din == 1
            d2_is1 = dout == 1
            cls1_nofast = (d1_is1 & (outdeg_src == 1)) \
                | (d2_is1 & (indeg_dst == 1))
            # dominate queries are the body's most expensive tables; only
            # TV1-scanning graphs read them, so skip the whole computation
            # on iterations where no graph is in that arm
            rdom, ldom = lax.cond(
                jnp.any(pc0 == PC_TV1),
                lambda: (dominates(hedge, hlen, hi_c, right=True),
                         dominates(hedge, hlen, ho_c, right=False)),
                lambda: (jnp.zeros((B, V), bool), jnp.zeros((B, V), bool)))
            cls1_fast = cls1_nofast | (d1_is1 & rdom) | (d2_is1 & ldom)
            one_sided = (d1_is1 | d2_is1) & (din > 0) & (dout > 0)
            base_triv = active_v & (din > 0) & (dout > 0) \
                & ~((din >= 2) & (dout >= 2)) & ~t["mixed"] & one_sided

            pos_ge_cur = varange[None, :] >= cur[:, None]

            # ======================= PC_BROKEN =======================
            brk_cand = active_v & ((din == 0) | (dout == 0))
            brk_any = jnp.any(brk_cand, axis=1)
            brk_x = jnp.argmax(brk_cand, axis=1).astype(jnp.int32)
            m_br = (pc0 == PC_BROKEN)
            fire_br = m_br & brk_any
            # apply: kill edges at x, hs-remove them
            exm = (edst == brk_x[:, None]) | (esrc == brk_x[:, None])
            exm = exm & ealive & fire_br[:, None]
            ealive_b = ealive & ~exm
            hedge_b = hs_remove_mask(hedge, hlen, exm)
            nz_b = nz.at[bi, brk_x].set(
                jnp.where(fire_br, False, nz[bi, brk_x]))
            larm, ltgt, ndec, ovf_b = logd(larm, ltgt, ndec, fire_br,
                                           BROKEN, brk_x)
            # no candidate: move to FAST
            to_fast = m_br & ~brk_any
            pc = jnp.where(to_fast, PC_FAST, pc)
            cur = jnp.where(to_fast, 1, cur)
            fired = jnp.where(to_fast, False, fired)

            ealive = jnp.where(fire_br[:, None], ealive_b, ealive)
            hedge = jnp.where(fire_br[:, None, None], hedge_b, hedge)
            nz = jnp.where(fire_br[:, None], nz_b, nz)

            # ======================= PC_FAST =========================
            fast_cand = base_triv & cls1_nofast & (bal_r < jump[:, None]) \
                & pos_ge_cur
            m_fa = (pc0 == PC_FAST)
            fa_any = jnp.any(fast_cand, axis=1)
            fa_f = jnp.argmax(fast_cand, axis=1).astype(jnp.int32)
            fire_fa = m_fa & fa_any
            # pass end
            end_fa = m_fa & ~fa_any
            pc = jnp.where(end_fa & fired, PC_BROKEN, pc)
            cur = jnp.where(end_fa & fired, 1, cur)
            pc = jnp.where(end_fa & ~fired, PC_TV1, pc)
            cur = jnp.where(end_fa & ~fired, 1, cur)
            tvr = jnp.where(end_fa & ~fired, INF, tvr)
            tvroot = jnp.where(end_fa & ~fired, -1, tvroot)
            fired = jnp.where(end_fa, False, fired)

            # ======================= PC_TV1 ==========================
            tv_base = base_triv & cls1_fast & pos_ge_cur
            r_im = tv_base & (bal_r < 1.02)
            m_tv = (pc0 == PC_TV1)
            im_any = jnp.any(r_im, axis=1)
            im_f = jnp.where(im_any, jnp.argmax(r_im, axis=1),
                             V).astype(jnp.int32)
            # window candidates strictly before the immediate fire
            win = tv_base & ~r_im & (varange[None, :] < im_f[:, None])
            rw = jnp.where(win, bal_r, INF)
            cmin_ex = jnp.concatenate(
                [jnp.full((B, 1), INF),
                 lax.cummin(rw, axis=1)[:, :-1]], axis=1)
            pref = jnp.minimum(tvr[:, None], cmin_ex)
            upd = win & (rw <= pref)
            ebrk = upd & (rw < jump[:, None])
            eb_any = jnp.any(ebrk, axis=1)
            eb_f = jnp.where(eb_any, jnp.argmax(ebrk, axis=1),
                             V).astype(jnp.int32)
            # positions <= eb_f (and < im_f via the window) update carry;
            # the early-break candidate updates carry, then fires
            upd_eff = upd & (varange[None, :] <= eb_f[:, None])
            new_tvr = jnp.min(jnp.where(upd_eff, rw, INF), axis=1)
            any_upd = jnp.any(upd_eff, axis=1)
            last_upd = (V - 1 - jnp.argmax(
                upd_eff[:, ::-1], axis=1)).astype(jnp.int32)
            tvr_n = jnp.where(any_upd, jnp.minimum(tvr, new_tvr), tvr)
            tvroot_n = jnp.where(any_upd, last_upd, tvroot)
            tvr = jnp.where(m_tv, tvr_n, tvr)
            tvroot = jnp.where(m_tv, tvroot_n, tvroot)

            fire_tv_im = m_tv & im_any & (im_f <= eb_f)
            fire_tv_eb = m_tv & eb_any & (eb_f < im_f)
            end_tv = m_tv & ~im_any & ~eb_any
            end_fire = end_tv & ~fired & (tvroot >= 0)
            # decompose target and return pc
            tv_fire = fire_tv_im | fire_tv_eb | end_fire
            tv_tgt = jnp.where(fire_tv_im, im_f,
                               jnp.where(fire_tv_eb, eb_f, tvroot))
            tv_ret = jnp.where(fire_tv_im, PC_TV1, PC_BROKEN)
            tv_retc = jnp.where(fire_tv_im, im_f + 1, 1)
            fired = jnp.where(fire_tv_im, True, fired)
            # pass ends without fire
            pc = jnp.where(end_tv & fired, PC_BROKEN, pc)
            cur = jnp.where(end_tv & fired, 1, cur)
            to_small = end_tv & ~fired & (tvroot < 0)
            pc = jnp.where(to_small, PC_SMALL, pc)
            cur = jnp.where(to_small, 1, cur)
            smr = jnp.where(to_small, smallr, smr)
            sme = jnp.where(to_small, -1, sme)
            fired = jnp.where(end_tv, False, fired)

            # ======================= PC_SMALL ========================
            m_sm = (pc0 == PC_SMALL)
            both_multi = active_v & (din > 1) & (dout > 1)
            in_ok = t["sm_in_e"] >= 0
            out_ok = t["sm_out_e"] >= 0
            r_in = jnp.where(in_ok, t["sm_in_w"] / w1, 0.0)
            r_out = jnp.where(out_ok, t["sm_out_w"] / w2, 0.0)
            use_in = r_in < r_out
            sm_e = jnp.where(in_ok & out_ok,
                             jnp.where(use_in, t["sm_in_e"],
                                       t["sm_out_e"]), -1)
            sm_r = jnp.where(in_ok & out_ok,
                             jnp.where(use_in, r_in, r_out), 0.0)
            smec = jnp.clip(sm_e, 0, E - 1)
            es = esrc[bi[:, None], smec]
            et = edst[bi[:, None], smec]
            deg_ok = (dout[bi[:, None], jnp.clip(es, 0, V - 1)] > 1) \
                & (din[bi[:, None], jnp.clip(et, 0, V - 1)] > 1)
            lext, rext = lax.cond(
                jnp.any(pc0 == PC_SMALL),
                lambda: extends(hedge, hlen, smec),
                lambda: (jnp.zeros((B, V), bool), jnp.zeros((B, V), bool)))
            ext_ok = ~(lext & rext)
            at_t = et == varange[None, :]
            at_s = es == varange[None, :]
            ext_ok = ext_ok & ~(at_t & rext) & ~(at_s & lext)
            z = estr[bi[:, None], smec]
            zc = jnp.clip(z, 0, 2)
            vs_in0 = t["sin"][:, :, 0]
            vs_out0 = t["sout"][:, :, 0]
            vs_in_z = jnp.take_along_axis(t["sin"], zc[:, :, None],
                                          axis=2)[:, :, 0]
            vs_out_z = jnp.take_along_axis(t["sout"], zc[:, :, None],
                                           axis=2)[:, :, 0]
            str_ok = ~(at_s & (z >= 1) & ((vs_in0 + vs_in_z) <= 1)) \
                & ~(at_t & (z >= 1) & ((vs_out0 + vs_out_z) <= 1))
            sm_cand = both_multi & (sm_e >= 0) & deg_ok & ext_ok \
                & str_ok & pos_ge_cur
            sm_im = sm_cand & (sm_r < 0.01)
            sm_im_any = jnp.any(sm_im, axis=1)
            sm_im_f = jnp.where(sm_im_any, jnp.argmax(sm_im, axis=1),
                                V).astype(jnp.int32)
            winm = sm_cand & ~sm_im & (varange[None, :]
                                       < sm_im_f[:, None])
            rwm = jnp.where(winm, sm_r, INF)
            cmin_ex_m = jnp.concatenate(
                [jnp.full((B, 1), INF),
                 lax.cummin(rwm, axis=1)[:, :-1]], axis=1)
            prefm = jnp.minimum(smr[:, None], cmin_ex_m)
            updm = winm & (rwm <= prefm)
            any_um = jnp.any(updm, axis=1)
            last_um = (V - 1 - jnp.argmax(
                updm[:, ::-1], axis=1)).astype(jnp.int32)
            new_smr = jnp.min(jnp.where(updm, rwm, INF), axis=1)
            smr_n = jnp.where(any_um, jnp.minimum(smr, new_smr), smr)
            sme_n = jnp.where(
                any_um, sm_e[bi, jnp.clip(last_um, 0, V - 1)], sme)
            smr = jnp.where(m_sm, smr_n, smr)
            sme = jnp.where(m_sm, sme_n, sme)

            fire_sm_im = m_sm & sm_im_any
            end_sm = m_sm & ~sm_im_any
            end_fire_sm = end_sm & ~fired & (sme >= 0)
            rm_edge = jnp.where(fire_sm_im,
                                sm_e[bi, jnp.clip(sm_im_f, 0, V - 1)],
                                sme)
            do_rm = fire_sm_im | end_fire_sm
            rm_c = jnp.clip(rm_edge, 0, E - 1)
            ealive = ealive.at[bi, rm_c].set(
                jnp.where(do_rm, False, ealive[bi, rm_c]))
            rm_mask = jnp.zeros((B, E), bool).at[bi, rm_c].set(do_rm)
            hedge = hs_remove_mask(hedge, hlen, rm_mask)
            larm, ltgt, ndec, ovf_s = logd(larm, ltgt, ndec, do_rm,
                                           SMALLEST, rm_edge)
            fired = jnp.where(fire_sm_im, True, fired)
            cur = jnp.where(fire_sm_im, sm_im_f + 1, cur)
            # pass ends
            pc = jnp.where(end_fire_sm, PC_BROKEN, pc)
            cur = jnp.where(end_fire_sm, 1, cur)
            done_sm = end_sm & ~fired & (sme < 0) & ~end_fire_sm
            pc = jnp.where(end_sm & fired, PC_BROKEN, pc)
            cur = jnp.where(end_sm & fired, 1, cur)
            fired = jnp.where(end_sm, False, fired)
            pc = jnp.where(done_sm, PC_DONE, pc)
            status = jnp.where(done_sm, ST_CLEAN, status)

            # =================== DECOMP trigger ======================
            # (from FAST fire or TV1 fires) — balance root, build pairs
            fire_fa_full = fire_fa
            trig = fire_fa_full | tv_fire
            troot = jnp.where(fire_fa_full, fa_f, tv_tgt)
            troot_c = jnp.clip(troot, 0, V - 1)
            dret = jnp.where(fire_fa_full, PC_FAST,
                             jnp.where(tv_fire, tv_ret, dret))
            dretc = jnp.where(fire_fa_full, fa_f + 1,
                              jnp.where(tv_fire, tv_retc, dretc))
            fired = jnp.where(fire_fa_full, True, fired)

            # balance_vertex(root) (scallop.cc:2486-2576)
            linr = t["lin"][bi, troot_c]                     # [B,DMAX]
            loutr = t["lout"][bi, troot_c]
            bw1 = t["inw"][bi, troot_c]
            bw2 = t["outw"][bi, troot_c]
            bww = jnp.sqrt(bw1 * bw2)
            r1 = bww / jnp.where(bw1 == 0.0, 1.0, bw1)
            r2 = bww / jnp.where(bw2 == 0.0, 1.0, bw2)

            def bal_side(lst, rr):
                def stp(j, car):
                    m, w = car
                    e = lst[:, j]
                    ok = (e >= 0) & trig
                    ec = jnp.clip(e, 0, E - 1)
                    wy = w[bi, ec] * rr
                    low = wy < guard
                    m = m + jnp.where(ok & low, guard - wy, 0.0)
                    wy = jnp.where(low, guard, wy)
                    w = w.at[bi, ec].set(jnp.where(ok, wy, w[bi, ec]))
                    return m, w
                return lax.fori_loop(0, DMAX, stp,
                                     (jnp.zeros(B, jnp.float64), ewrt))
            m1, ewrt = bal_side(linr, r1)
            m2, ewrt = bal_side(loutr, r2)
            sur_out = jnp.clip(loutr[:, 0], 0, E - 1)
            sur_in = jnp.clip(linr[:, 0], 0, E - 1)
            add_out = trig & (m1 > m2)
            add_in = trig & (m1 < m2)
            ewrt = ewrt.at[bi, sur_out].add(
                jnp.where(add_out, m1 - m2, 0.0))
            ewrt = ewrt.at[bi, sur_in].add(
                jnp.where(add_in, m2 - m1, 0.0))

            # pairs: singleton side x multi side, insertion order =
            # multi-side stamp order
            d1r = din[bi, troot_c]
            side = jnp.where(d1r == 1, 0, 1).astype(jnp.int32)
            single_e = jnp.where(side == 0, linr[:, 0], loutr[:, 0])
            multi = jnp.where(side[:, None] == 0, loutr, linr)
            npairs = jnp.sum(multi >= 0, axis=1).astype(jnp.int32)
            sc = jnp.clip(single_e, 0, E - 1)
            w_single = ewrt[bi, sc]
            mc = jnp.clip(multi, 0, E - 1)
            w_multi = jnp.where(multi >= 0, ewrt[bi[:, None], mc], 0.0)
            pw = jnp.minimum(w_single[:, None], w_multi)
            # md: singleton accumulates in insertion order; multi = pw
            def md_step(j, acc):
                ok = (multi[:, j] >= 0) & trig
                return acc + jnp.where(ok, pw[:, j], 0.0)
            md_single = lax.fori_loop(0, DMAX, md_step,
                                      jnp.zeros(B, jnp.float64))
            ewrt = ewrt.at[bi, sc].set(
                jnp.where(trig, md_single, ewrt[bi, sc]))
            me_flat = jnp.where(multi >= 0, multi, BIGI)
            # invalid pair slots scatter to the dropped row E (duplicate
            # writes to a clipped slot 0 would clobber real weights)
            mc_safe = jnp.where((multi >= 0) & trig[:, None], multi, E)
            ewrt = ewrt.at[bi[:, None], mc_safe].set(pw, mode="drop")
            # processing order: sorted by (e1,e2) == sorted by multi id
            order_p = jnp.argsort(me_flat, axis=1)
            multi_s = jnp.take_along_axis(multi, order_p, axis=1)
            pw_s = jnp.take_along_axis(pw, order_p, axis=1)
            p_e1 = jnp.where(side[:, None] == 0,
                             single_e[:, None], multi_s)
            p_e2 = jnp.where(side[:, None] == 0,
                             multi_s, single_e[:, None])
            p_e1 = jnp.where(multi_s >= 0, p_e1, -1)
            p_e2 = jnp.where(multi_s >= 0, p_e2, -1)

            dp_e1 = jnp.where(trig[:, None], p_e1, dp_e1)
            dp_e2 = jnp.where(trig[:, None], p_e2, dp_e2)
            dp_w = jnp.where(trig[:, None], pw_s, dp_w)
            dp_n = jnp.where(trig, npairs, dp_n)
            dp_k = jnp.where(trig, 0, dp_k)
            dp_ms = jnp.where(trig, npairs, dp_ms)
            dside = jnp.where(trig, side, dside)
            droot = jnp.where(trig, troot, droot)
            pc = jnp.where(trig, PC_DECOMP, pc)
            larm, ltgt, ndec, ovf_t = logd(larm, ltgt, ndec, trig,
                                           TRIVIAL, troot)
            # pair/degree capacity
            ovf_cap = trig & ((npairs > DMAX) | t["deg_over"])

            # =================== PC_DECOMP (one pair) ================
            m_dc = (pc0 == PC_DECOMP)   # triggers had pc0 == FAST/TV1
            kc = jnp.clip(dp_k, 0, DMAX - 1)
            pe1 = dp_e1[bi, kc]
            pe2 = dp_e2[bi, kc]
            pww = dp_w[bi, kc]
            do_pair = m_dc & (dp_k < dp_n)
            pe1c = jnp.clip(pe1, 0, E - 1)
            pe2c = jnp.clip(pe2, 0, E - 1)

            ovf_e = do_pair & (nedges + 3 > E)
            ok_pair = do_pair & ~ovf_e

            def split(ei, w, ewrt, esrc, edst, estr, esin, esout,
                      ealive, nedges, nstamp, mask):
                ww = ewrt[bi, ei]
                keep = jnp.abs(ww - w) <= smin
                mk_new = mask & ~keep
                slot = jnp.clip(nedges, 0, E - 1)
                www = ww - w
                www = jnp.where(www <= guard, guard, www)
                ewrt = ewrt.at[bi, ei].set(
                    jnp.where(mk_new, www, ewrt[bi, ei]))
                esrc = esrc.at[bi, slot].set(
                    jnp.where(mk_new, esrc[bi, ei], esrc[bi, slot]))
                edst = edst.at[bi, slot].set(
                    jnp.where(mk_new, edst[bi, ei], edst[bi, slot]))
                estr = estr.at[bi, slot].set(
                    jnp.where(mk_new, estr[bi, ei], estr[bi, slot]))
                ewrt = ewrt.at[bi, slot].set(
                    jnp.where(mk_new, w, ewrt[bi, slot]))
                esin = esin.at[bi, slot].set(
                    jnp.where(mk_new, nstamp, esin[bi, slot]))
                esout = esout.at[bi, slot].set(
                    jnp.where(mk_new, nstamp, esout[bi, slot]))
                ealive = ealive.at[bi, slot].set(
                    jnp.where(mk_new, True, ealive[bi, slot]))
                out = jnp.where(mk_new, nedges, ei)
                nedges = nedges + mk_new.astype(jnp.int32)
                nstamp = nstamp + mk_new.astype(jnp.int32)
                return out, ewrt, esrc, edst, estr, esin, esout, \
                    ealive, nedges, nstamp

            x1, ewrt, esrc, edst, estr, esin, esout, ealive, nedges, \
                nstamp = split(pe1c, pww, ewrt, esrc, edst, estr, esin,
                               esout, ealive, nedges, nstamp, ok_pair)
            y1, ewrt, esrc, edst, estr, esin, esout, ealive, nedges, \
                nstamp = split(pe2c, pww, ewrt, esrc, edst, estr, esin,
                               esout, ealive, nedges, nstamp, ok_pair)
            x1c = jnp.clip(x1, 0, E - 1)
            y1c = jnp.clip(y1, 0, E - 1)
            # merge x1,y1 -> n
            nslot = jnp.clip(nedges, 0, E - 1)
            wx0 = ewrt[bi, x1c]
            wy0 = ewrt[bi, y1c]
            esrc = esrc.at[bi, nslot].set(
                jnp.where(ok_pair, esrc[bi, x1c], esrc[bi, nslot]))
            edst = edst.at[bi, nslot].set(
                jnp.where(ok_pair, edst[bi, y1c], edst[bi, nslot]))
            ewrt = ewrt.at[bi, nslot].set(
                jnp.where(ok_pair, wx0 * 0.5 + wy0 * 0.5,
                          ewrt[bi, nslot]))
            zstr = jnp.where(estr[bi, y1c] != 0, estr[bi, y1c],
                             jnp.where(estr[bi, x1c] != 0,
                                       estr[bi, x1c], 0))
            estr = estr.at[bi, nslot].set(
                jnp.where(ok_pair, zstr, estr[bi, nslot]))
            esin = esin.at[bi, nslot].set(
                jnp.where(ok_pair, nstamp, esin[bi, nslot]))
            esout = esout.at[bi, nslot].set(
                jnp.where(ok_pair, nstamp, esout[bi, nslot]))
            ealive = ealive.at[bi, nslot].set(
                jnp.where(ok_pair, True, ealive[bi, nslot]))
            ealive = ealive.at[bi, x1c].set(
                jnp.where(ok_pair, False, ealive[bi, x1c]))
            ealive = ealive.at[bi, y1c].set(
                jnp.where(ok_pair, False, ealive[bi, y1c]))
            newe = nedges
            nedges = nedges + ok_pair.astype(jnp.int32)
            nstamp = nstamp + ok_pair.astype(jnp.int32)
            # root erasure when isolated (recompute degrees inline)
            rc = jnp.clip(droot, 0, V - 1)
            deg_root = jnp.sum(
                ealive & ((edst == rc[:, None]) | (esrc == rc[:, None])),
                axis=1)
            nz = nz.at[bi, rc].set(
                jnp.where(ok_pair & (deg_root == 0), False, nz[bi, rc]))
            # hs updates (original pair ids, new edge id)
            he2, hl2 = hs_replace_pair(hedge, hlen, pe1, pe2, newe)
            hedge = jnp.where(ok_pair[:, None, None], he2, hedge)
            hlen = jnp.where(ok_pair[:, None], hl2, hlen)
            m_e1 = jnp.where(dside == 0, dp_ms, 1)
            m_e2 = jnp.where(dside == 0, 1, dp_ms)
            r1m = ok_pair & (m_e1 == 1)
            hr = hs_replace_single(hedge, hlen, pe1, newe)
            hedge = jnp.where(r1m[:, None, None], hr, hedge)
            r2m = ok_pair & (m_e2 == 1)
            hr = hs_replace_single(hedge, hlen, pe2, newe)
            hedge = jnp.where(r2m[:, None, None], hr, hedge)
            dp_k = dp_k + do_pair.astype(jnp.int32)

            # decomp end: all pairs processed -> hs_remove pair edges,
            # erase root, return (dp_k already incremented this iteration)
            dend = m_dc & (dp_k >= dp_n)
            in1 = jnp.any((earange[None, None, :] == dp_e1[:, :, None])
                          & (dp_e1[:, :, None] >= 0), axis=1)
            in2 = jnp.any((earange[None, None, :] == dp_e2[:, :, None])
                          & (dp_e2[:, :, None] >= 0), axis=1)
            prs = (in1 | in2) & dend[:, None]
            hedge = hs_remove_mask(hedge, hlen, prs)
            nz = nz.at[bi, rc].set(jnp.where(dend, False, nz[bi, rc]))
            pc = jnp.where(dend, dret, pc)
            cur = jnp.where(dend, dretc, cur)

            # overflow consolidation
            ovf = ovf_b | ovf_s | ovf_t | ovf_cap | ovf_e
            pc = jnp.where(ovf, PC_DONE, pc)
            status = jnp.where(ovf, ST_OVERFLOW, status)

            return (esrc, edst, ewrt, estr, esin, esout, ealive, nedges,
                    nstamp, nz, hedge, hlen, pc, cur, fired, tvr, tvroot,
                    smr, sme, droot, dp_e1, dp_e2, dp_w, dp_n, dp_k,
                    dp_ms, dside, dret, dretc, larm, ltgt, ndec, status,
                    it + 1)

        out = lax.while_loop(cond, body, st0)
        (esrc, edst, ewrt, estr, esin, esout, ealive, nedges, nstamp, nz,
         hedge, hlen, pc, cur, fired, tvr, tvroot, smr, sme, droot,
         dp_e1, dp_e2, dp_w, dp_n, dp_k, dp_ms, dside, dret, dretc,
         larm, ltgt, ndec, status, it) = out
        status = jnp.where(status == ST_RUN, ST_OVERFLOW, status)
        return (larm, ltgt, ndec, status, ewrt, ealive, esrc, edst,
                estr, nedges, hedge, hlen, nz)

    return ladder


def get_ladder_fn(B=DEFAULT_B, V=DEFAULT_V, E=DEFAULT_E, H=DEFAULT_H,
                  L=DEFAULT_L, DMAX=DEFAULT_DMAX, DLOG=DEFAULT_DLOG,
                  maxiter=None):
    if maxiter is None:
        maxiter = 4 * V * V
    key = (B, V, E, H, L, DMAX, DLOG, maxiter)
    fn = _CACHE.get(key)
    if fn is None:
        import jax
        with jax.enable_x64():
            import jax.numpy as jnp
            fn = jax.jit(_build(jax, jnp, B, V, E, H, L, DMAX, DLOG,
                                maxiter))
        _CACHE[key] = fn
    return fn


def pack_states(states, B, V, E, H, L):
    """Pack a list of ladder_ref.LadderState into batch arrays (None
    entries become inactive rows)."""
    arr = dict(
        esrc=np.full((B, E), -1, np.int32),
        edst=np.full((B, E), -1, np.int32),
        ewrt=np.zeros((B, E), np.float64),
        estr=np.zeros((B, E), np.int32),
        esin=np.zeros((B, E), np.int32),
        esout=np.zeros((B, E), np.int32),
        ealive=np.zeros((B, E), bool),
        nedges=np.zeros(B, np.int32),
        nstamp=np.zeros(B, np.int32),
        nz=np.zeros((B, V), bool),
        hedge=np.full((B, H, L), -1, np.int32),
        hlen=np.zeros((B, H), np.int32),
        nv=np.zeros(B, np.int32),
        jump=np.zeros(B, np.float64),
        smallr=np.zeros(B, np.float64),
        guard=np.zeros(B, np.float64),
        smin=np.zeros(B, np.float64),
    )
    for b, st in enumerate(states):
        if st is None:
            continue
        ne = st.n_edges
        arr["esrc"][b, :ne] = st.e_src[:ne]
        arr["edst"][b, :ne] = st.e_dst[:ne]
        arr["ewrt"][b, :ne] = st.e_wrt[:ne]
        arr["estr"][b, :ne] = st.e_str[:ne]
        arr["esin"][b, :ne] = st.e_in_stamp[:ne]
        arr["esout"][b, :ne] = st.e_out_stamp[:ne]
        arr["ealive"][b, :ne] = st.e_alive[:ne]
        arr["nedges"][b] = ne
        arr["nstamp"][b] = st.next_stamp
        arr["nz"][b, :st.nv] = st.nonzero
        nh = st.n_hyper
        arr["hedge"][b, :nh] = st.h_edge[:nh]
        arr["hlen"][b, :nh] = st.h_len[:nh]
        arr["nv"][b] = st.nv
        arr["jump"][b] = st.jump_ratio
        arr["smallr"][b] = st.small_ratio
        arr["guard"][b] = st.guard
        arr["smin"][b] = st.smin
    return arr


def run_kernel(states, B=None, V=DEFAULT_V, E=DEFAULT_E, H=DEFAULT_H,
               L=DEFAULT_L, DMAX=DEFAULT_DMAX, DLOG=DEFAULT_DLOG):
    """Convenience driver: pack, dispatch, unpack per-graph decision
    logs [(arm, tgt)] + statuses + final dense fields."""
    import jax

    if B is None:
        B = max(1, len(states))
    arr = pack_states(states, B, V, E, H, L)
    fn = get_ladder_fn(B, V, E, H, L, DMAX, DLOG)
    with jax.enable_x64():
        import jax.numpy as jnp
        out = fn(*[jnp.asarray(arr[k]) for k in
                   ("esrc", "edst", "ewrt", "estr", "esin", "esout",
                    "ealive", "nedges", "nstamp", "nz", "hedge", "hlen",
                    "nv", "jump", "smallr", "guard", "smin")])
        out = [np.asarray(o) for o in out]
    larm, ltgt, ndec, status = out[:4]
    logs = []
    for b in range(len(states)):
        n = int(ndec[b])
        logs.append([(int(larm[b, i]), int(ltgt[b, i]))
                     for i in range(min(n, DLOG))])
    return logs, status, out[4:]
