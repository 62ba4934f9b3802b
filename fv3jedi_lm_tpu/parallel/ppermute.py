"""Neighbor halo exchange as `shard_map` + `lax.ppermute` over the face axis.

The ICI-native communication pattern SURVEY §5.8 prescribes (the analogue
of FMS `mpp_update_domains` neighbor sends, tools/fv_mp_nlm_mod.F90): with
the cube-face axis sharded one-face-per-device — the reference's minimal
"1 rank per tile x 6" distributed configuration — each face SENDS its four
edge strips to the adjacent faces over `lax.ppermute` (point-to-point ICI
neighbor traffic, not a lowered all-gather), and each receiver scatters
the strips into its halo with the cube-edge rotation applied.

Everything is DERIVED from the same static topology gather map that the
single-device `halo.fill_halo_center` uses, so the exchanged result is
bitwise identical to the gather path wherever sources live on a side
neighbor (all of them, for the center-scalar map).

The 24 directed edge transfers are greedily grouped into rounds whose
(src, dst) pairs form valid partial permutations; each round is ONE
ppermute of an (ng, jc) strip per device.
"""

from __future__ import annotations

import numpy as np

#: cache keyed by id(topology map)
_PLAN_CACHE: dict = {}


def _center_plan(topo):
    """Static exchange plan from the topology's center-scalar gather map.

    Returns dict with:
      nrounds
      send_side[6, nrounds]  int, side strip to send this round (-1 = none)
      perms[nrounds]         list of (src, dst) pairs
      pos[6, nrounds, H]     local flat halo positions to fill (-1 pad)
      src[6, nrounds, H]     flat index into the received (ng, jc) strip
      strips[4] -> (row slice, col slice, transpose) canonical side strips
    """
    idx = np.asarray(topo.halo_map_center())
    key = id(idx)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    ng = topo.ng
    jc = idx.shape[-1]
    n = jc - 2 * ng
    fsz = jc * jc
    ident = np.arange(6 * fsz).reshape(6, jc, jc)
    nonid = idx != ident
    src_face = idx // fsz

    # canonical side strips of a face, all shaped (ng, jc) after transform:
    # rows indexed by distance-from-edge 0..ng-1, cols = full width.
    # side order matches grid/topology: 0=S(y=low),1=E,2=N,3=W (determined
    # empirically below from the map itself, so no assumption is needed).
    def strip_coords(side):
        d = np.arange(ng)
        t = np.arange(jc)
        dd, tt = np.meshgrid(d, t, indexing="ij")
        if side == 0:      # south: rows ng..ng+ng-1? no — interior rows
            r, c = ng + dd, tt
        elif side == 1:    # north: rows ng+n-1-dd
            r, c = ng + n - 1 - dd, tt
        elif side == 2:    # west: cols ng+dd
            r, c = tt, ng + dd
        else:              # east: cols ng+n-1-dd
            r, c = tt, ng + n - 1 - dd
        return r, c

    strip_flat = [np.ravel_multi_index(strip_coords(s), (jc, jc))
                  for s in range(4)]
    in_strip = []
    for s in range(4):
        m = np.full(fsz, -1, np.int64)
        m[strip_flat[s].ravel()] = np.arange(ng * jc)
        in_strip.append(m)

    # intra-face non-identity copies (corner-wedge replication): purely
    # local, no communication
    HL = 1
    loc_pos_l, loc_src_l = [], []
    for f in range(6):
        mask = nonid[f] & (src_face[f] == f)
        pos = np.flatnonzero(mask.reshape(fsz))
        srcs = idx[f].reshape(fsz)[pos] - f * fsz
        loc_pos_l.append(pos)
        loc_src_l.append(srcs)
        HL = max(HL, len(pos))
    loc_pos = np.full((6, HL), -1, np.int64)
    loc_src = np.zeros((6, HL), np.int64)
    for f in range(6):
        loc_pos[f, :len(loc_pos_l[f])] = loc_pos_l[f]
        loc_src[f, :len(loc_src_l[f])] = loc_src_l[f]

    # directed transfers (f2 -> f): positions on f sourcing from face f2
    transfers = []  # (src_face, dst_face, side_of_src, pos_list, src_list)
    for f in range(6):
        for f2 in range(6):
            if f2 == f:
                continue
            mask = nonid[f] & (src_face[f] == f2)
            if not mask.any():
                continue
            pos = np.flatnonzero(mask.reshape(fsz))
            srcs = idx[f].reshape(fsz)[pos] - f2 * fsz  # flat within f2
            # which canonical strip of f2 covers ALL sources?
            side = None
            for s in range(4):
                loc = in_strip[s][srcs]
                if (loc >= 0).all():
                    side = s
                    src_in_strip = loc
                    break
            if side is None:
                raise ValueError(
                    f"halo sources of face {f} from {f2} not within one "
                    f"ng-deep side strip")
            transfers.append((f2, f, side, pos, src_in_strip))

    # greedy round grouping: distinct src and dst per round
    rounds = []
    remaining = list(transfers)
    while remaining:
        used_s, used_d, this, rest = set(), set(), [], []
        for tr in remaining:
            if tr[0] not in used_s and tr[1] not in used_d:
                used_s.add(tr[0])
                used_d.add(tr[1])
                this.append(tr)
            else:
                rest.append(tr)
        rounds.append(this)
        remaining = rest

    nrounds = len(rounds)
    H = max(len(tr[3]) for tr in transfers)
    send_side = np.full((6, nrounds), -1, np.int32)
    pos_tab = np.full((6, nrounds, H), -1, np.int64)
    src_tab = np.zeros((6, nrounds, H), np.int64)
    perms = []
    for r, this in enumerate(rounds):
        perms.append([(tr[0], tr[1]) for tr in this])
        for (f2, f, side, pos, sis) in this:
            send_side[f2, r] = side
            pos_tab[f, r, :len(pos)] = pos
            src_tab[f, r, :len(sis)] = sis

    plan = dict(nrounds=nrounds, send_side=send_side, perms=perms,
                pos=pos_tab, src=src_tab, ng=ng, jc=jc,
                loc_pos=loc_pos, loc_src=loc_src,
                strip_flat=np.stack(strip_flat).reshape(4, -1))
    _PLAN_CACHE[key] = plan
    return plan


def fill_halo_center_ppermute(q, topo, mesh, face_axis="face"):
    """Center-scalar halo exchange over a face-sharded mesh via ppermute.

    q: (..., 6, jc, jc) sharded one face per device along `face_axis`
    (mesh must have size 6 on that axis).  Bitwise-equal to
    halo.fill_halo_center on the gathered result.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map

    plan = _center_plan(topo)
    nr = plan["nrounds"]
    ng, jc = plan["ng"], plan["jc"]
    fsz = jc * jc
    send_side = jnp.asarray(plan["send_side"])      # (6, nr)
    pos_tab = jnp.asarray(plan["pos"])              # (6, nr, H)
    src_tab = jnp.asarray(plan["src"])              # (6, nr, H)
    strip_flat = jnp.asarray(plan["strip_flat"])    # (4, ng*jc)
    loc_pos = jnp.asarray(plan["loc_pos"])          # (6, HL)
    loc_src = jnp.asarray(plan["loc_src"])          # (6, HL)

    nbatch = q.ndim - 3
    spec = P(*([None] * nbatch), face_axis, None, None)

    def body(ql):
        # ql: (..., 1, jc, jc) — this device's face
        me = lax.axis_index(face_axis)
        flat = ql.reshape(ql.shape[:-3] + (fsz,))
        # one scratch slot at index fsz absorbs the -1 padding writes so
        # real positions never see duplicate scatter indices
        out = jnp.concatenate(
            [flat, jnp.zeros(flat.shape[:-1] + (1,), flat.dtype)], axis=-1)
        for r in range(nr):
            # choose this round's outgoing strip (or side 0 when idle);
            # strips are read from the ORIGINAL face data, matching the
            # single-program gather's read-everything-from-input semantics
            side = send_side[me, r]
            sf = strip_flat[jnp.maximum(side, 0)]
            strip = jnp.take(flat, sf, axis=-1)
            recv = lax.ppermute(strip, face_axis, plan["perms"][r])
            # scatter the received strip into our halo positions
            pos = pos_tab[me, r]                    # (H,)
            src = src_tab[me, r]
            vals = jnp.take(recv, src, axis=-1)
            posc = jnp.where(pos >= 0, pos, fsz)
            out = out.at[..., posc].set(vals)
        # intra-face corner-wedge replication (no communication)
        lp = loc_pos[me]
        lvals = jnp.take(flat, loc_src[me], axis=-1)
        out = out.at[..., jnp.where(lp >= 0, lp, fsz)].set(lvals)
        return out[..., :fsz].reshape(ql.shape)

    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)(q)
