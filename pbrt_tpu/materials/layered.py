"""Layered BxDF: stochastic transport between a top (dielectric) and bottom
(diffuse/conductor) interface with an optional HG medium between them.

Vectorized re-expression of reference bxdfs/layered_bxdf.h (501 LoC,
pbrt-v4's LayeredBxDF, twoSided=true): per-thread random walks with early
`continue`/`break` become masked lanes in bounded `lax.fori_loop`s; the
walk's internal RNG is the same hash-seeded PCG32 (layered_bxdf.h:88-90,
so results are decorrelated from the integrator's sample streams without
consuming sampler dimensions).

CoatedDiffuseBxDF  = Layered<DielectricBxDF, DiffuseBxDF>
CoatedConductorBxDF = Layered<DielectricBxDF, ConductorBxDF>
(coated_diffuse_bxdf.h / coated_conductor_bxdf.h type aliases).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.utils.math import power_heuristic
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.materials import bxdfs
from pbrt_tpu.sampling import rng as prng
from pbrt_tpu.sampling import warps


class LayeredParams(NamedTuple):
    top: bxdfs.BxdfParams      # dielectric interface
    bottom: bxdfs.BxdfParams   # diffuse or conductor
    thickness: jnp.ndarray     # (R,)
    g: jnp.ndarray             # (R,)
    albedo: jnp.ndarray        # (R,4) medium albedo
    max_depth: int             # static
    n_samples: int             # static


def _hash_vec3(v):
    """pbrt::hash(Vector3f) of the float bits -> U64 (util/hash.h)."""
    bits = [jax.lax.bitcast_convert_type(v[..., i], jnp.uint32) for i in range(3)]
    return prng.murmur64a_u32_words(bits)


def _hash_uc_u2(uc, u2):
    bits = [
        jax.lax.bitcast_convert_type(uc, jnp.uint32),
        jax.lax.bitcast_convert_type(u2[..., 0], jnp.uint32),
        jax.lax.bitcast_convert_type(u2[..., 1], jnp.uint32),
    ]
    return prng.murmur64a_u32_words(bits)


def _rng_from(seed_a, seed_b):
    return prng.set_sequence(seed_a, seed_b)


def _r1(r):
    r2, u = prng.uniform_float(r)
    return r2, jnp.minimum(u, 1.0 - 1e-7)


def _r2(r):
    r, ua = _r1(r)
    r, ub = _r1(r)
    return r, jnp.stack([ua, ub], axis=-1)


def _tr(dz, w):
    """Transmittance exp(-|dz / w.z|) (layered_bxdf.h:487-492, sigma_t=1)."""
    cz = jnp.abs(w[..., 2])
    tau = jnp.abs(dz) / jnp.maximum(cz, 1e-9)
    return jnp.exp(-jnp.minimum(tau, 80.0))


def _neg(w):
    return -w


def _flip_z(v):
    return v * jnp.asarray([1.0, 1.0, -1.0])


def layered_f(p: LayeredParams, wo, wi):
    """Stochastic f estimate (layered_bxdf.h:53-245). (R,4)."""
    # twoSided: flip both into the upper hemisphere
    flip = wo[..., 2] < 0.0
    wo = jnp.where(flip[..., None], -wo, wo)
    wi = jnp.where(flip[..., None], -wi, wi)

    same = wo[..., 2] * wi[..., 2] > 0.0
    # enteredTop is always true for twoSided; exit interface:
    # same_hemisphere(wo,wi) ^ true -> bottom exit? (false when same) -> top
    exit_is_bottom = ~same          # same -> exit top, else bottom
    exit_z = jnp.where(exit_is_bottom, 0.0, p.thickness)

    from pbrt_tpu.materials import scattering as _sc

    top_specular = _sc.effectively_smooth(p.top.ax, p.top.ay)
    bottom_specular = (p.bottom.kind == bxdfs.K_CONDUCTOR) & _sc.effectively_smooth(
        p.bottom.ax, p.bottom.ay
    )

    f_acc = jnp.zeros_like(p.albedo)
    # reflection at the entrance interface (top, dielectric)
    f_enter = bxdfs.f(p.top, wo, wi)
    f_acc = f_acc + jnp.where(same[..., None], p.n_samples * f_enter, 0.0)
    exit_specular = jnp.where(exit_is_bottom, bottom_specular, top_specular)
    nonexit_specular = jnp.where(exit_is_bottom, top_specular, bottom_specular)

    r = _rng_from(_hash_vec3(wo), _hash_vec3(wi))

    spec_exit = None  # exit interface specular? top/bottom both may be glossy

    def exit_f(w_neg, wi_out, exit_is_bottom):
        fb = bxdfs.f(p.bottom, w_neg, wi_out)
        ft = bxdfs.f(p.top, w_neg, wi_out)
        return jnp.where(exit_is_bottom[..., None], fb, ft)

    def exit_pdf_trans(w_neg, wi_out, exit_is_bottom):
        pb = bxdfs.pdf(p.bottom, w_neg, wi_out, allow_refl=True, allow_trans=True)
        pt = bxdfs.pdf(p.top, w_neg, wi_out, allow_refl=False, allow_trans=True)
        return jnp.where(exit_is_bottom, pb, pt)

    def iface_sample(params_top, params_bottom, use_bottom, w_in, uc, u2,
                     allow_refl=True, allow_trans=True):
        bs_t = bxdfs.sample(params_top, w_in, uc, u2, allow_refl, allow_trans)
        bs_b = bxdfs.sample(params_bottom, w_in, uc, u2, allow_refl, allow_trans)
        pick = lambda a, b: jnp.where(use_bottom[..., None] if a.ndim > 1 else use_bottom, b, a)
        return bxdfs.BSDFSample(
            f=jnp.where(use_bottom[..., None], bs_b.f, bs_t.f),
            wi=jnp.where(use_bottom[..., None], bs_b.wi, bs_t.wi),
            pdf=jnp.where(use_bottom, bs_b.pdf, bs_t.pdf),
            flags=jnp.where(use_bottom, bs_b.flags, bs_t.flags),
            eta=jnp.where(use_bottom, bs_b.eta, bs_t.eta),
            valid=jnp.where(use_bottom, bs_b.valid, bs_t.valid),
        )

    for _s in range(p.n_samples):
        # entrance transmission sample (top interface, transmission only)
        r, uc = _r1(r)
        r, u2 = _r2(r)
        wos = bxdfs.sample(p.top, wo, uc, u2, allow_refl=False, allow_trans=True)
        ok_o = wos.valid & jnp.any(wos.f > 0, -1) & (wos.pdf > 0) & (wos.wi[..., 2] != 0)

        # virtual light sample from wi through the exit interface (transmission)
        r, uc = _r1(r)
        r, u2 = _r2(r)
        # virtual light sample uses importance transport (!mode): no 1/eta^2
        wis_t = bxdfs.sample(p.top, wi, uc, u2, allow_refl=False, allow_trans=True,
                             mode_radiance=False)
        wis_b = bxdfs.sample(p.bottom, wi, uc, u2, allow_refl=False, allow_trans=True,
                             mode_radiance=False)
        wis = bxdfs.BSDFSample(
            f=jnp.where(exit_is_bottom[..., None], wis_b.f, wis_t.f),
            wi=jnp.where(exit_is_bottom[..., None], wis_b.wi, wis_t.wi),
            pdf=jnp.where(exit_is_bottom, wis_b.pdf, wis_t.pdf),
            flags=jnp.where(exit_is_bottom, wis_b.flags, wis_t.flags),
            eta=jnp.where(exit_is_bottom, wis_b.eta, wis_t.eta),
            valid=jnp.where(exit_is_bottom, wis_b.valid, wis_t.valid),
        )
        ok_i = wis.valid & jnp.any(wis.f > 0, -1) & (wis.pdf > 0) & (wis.wi[..., 2] != 0)

        alive = ok_o & ok_i
        beta = wos.f * vm.abs_cos_theta(wos.wi)[..., None] / jnp.maximum(
            wos.pdf, 1e-12
        )[..., None]
        z = jnp.broadcast_to(p.thickness, wo.shape[:-1])  # entered top
        w = wos.wi
        has_albedo = jnp.any(p.albedo > 0, -1)

        def body(depth, carry):
            r, f_acc, beta, z, w, alive = carry
            # RR (depth > 3 && beta small)
            bmax = jnp.max(beta, -1)
            r, u_rr = _r1(r)
            # RR only past depth 3 (layered_bxdf.h); depth is a loop-carried
            # tracer under fori_loop, so the guard is a where-mask
            rr_on = depth > 3
            q = jnp.maximum(0.0, 1.0 - bmax)
            kill = rr_on & alive & (bmax < 0.25) & (u_rr < q)
            beta = jnp.where(
                (rr_on & alive & (bmax < 0.25) & ~kill)[..., None],
                beta / jnp.maximum(1.0 - q, 1e-9)[..., None],
                beta,
            )
            alive = alive & ~kill

            # medium segment
            r, u_d = _r1(r)
            dz = -jnp.log1p(-u_d) * jnp.abs(w[..., 2])  # sample_exponential(u, 1/|wz|)
            zp_scatter = jnp.where(w[..., 2] > 0, z + dz, z - dz)
            scatter = alive & has_albedo & (zp_scatter > 0) & (zp_scatter < p.thickness)
            # no-albedo: advance to the other boundary with transmittance
            z_noal = jnp.where(z == p.thickness, 0.0, p.thickness)
            beta = jnp.where(
                (alive & ~has_albedo)[..., None],
                beta * _tr(p.thickness, w)[..., None],
                beta,
            )
            z_next_boundary = jnp.where(
                has_albedo, jnp.clip(zp_scatter, 0.0, p.thickness), z_noal
            )

            # --- scattering event inside the medium
            # NEE through exit interface using wis
            ph_exit = warps.henyey_greenstein(vm.dot(-w, -wis.wi), p.g)
            wt = jnp.where(
                exit_specular, 1.0, power_heuristic(1.0, wis.pdf, 1.0, ph_exit)
            )
            nee_med = (
                beta
                * p.albedo
                * ph_exit[..., None]
                * wt[..., None]
                * _tr(zp_scatter - exit_z, wis.wi)[..., None]
                * wis.f
                / jnp.maximum(wis.pdf, 1e-12)[..., None]
            )
            f_acc = f_acc + jnp.where(scatter[..., None], nee_med, 0.0)
            # phase resample
            r, u_ph = _r2(r)
            wi_ph, pdf_ph = warps.sample_henyey_greenstein(-w, p.g, u_ph)
            ok_ph = (pdf_ph > 0) & (wi_ph[..., 2] != 0)
            beta_sc = beta * p.albedo  # rho/pdf == 1 for HG
            w_sc = wi_ph
            z_sc = zp_scatter
            # possible extra exit-NEE after the phase bounce
            toward_exit = ((z_sc < exit_z) & (w_sc[..., 2] > 0)) | (
                (z_sc > exit_z) & (w_sc[..., 2] < 0)
            )
            f_exit = exit_f(-w_sc, wi, exit_is_bottom)
            pdf_exit = exit_pdf_trans(-w_sc, wi, exit_is_bottom)
            wt2 = power_heuristic(1.0, pdf_ph, 1.0, pdf_exit)
            nee2 = beta_sc * _tr(z_sc - exit_z, w_sc)[..., None] * f_exit * wt2[..., None]
            f_acc = f_acc + jnp.where(
                (scatter & ok_ph & toward_exit)[..., None], nee2, 0.0
            )

            # --- interface event (lanes that reached a boundary)
            at_boundary = alive & ~scatter
            z_b = z_next_boundary
            at_exit = at_boundary & (z_b == exit_z)
            at_nonexit = at_boundary & (z_b != exit_z)

            # exit interface reflection resample (keeps walking)
            r, uc_e = _r1(r)
            r, u2_e = _r2(r)
            bs_exit = iface_sample(p.top, p.bottom, exit_is_bottom, -w, uc_e, u2_e,
                                   allow_refl=True, allow_trans=False)
            ok_exit = bs_exit.valid & jnp.any(bs_exit.f > 0, -1) & (bs_exit.pdf > 0) & (
                bs_exit.wi[..., 2] != 0
            )
            beta_exit = beta * bs_exit.f * vm.abs_cos_theta(bs_exit.wi)[..., None] / jnp.maximum(
                bs_exit.pdf, 1e-12
            )[..., None]

            # non-exit interface: NEE along wis, then reflection resample
            nonexit_is_bottom = ~exit_is_bottom
            f_ne = jnp.where(
                nonexit_is_bottom[..., None],
                bxdfs.f(p.bottom, -w, -wis.wi),
                bxdfs.f(p.top, -w, -wis.wi),
            )
            pdf_ne = jnp.where(
                nonexit_is_bottom,
                bxdfs.pdf(p.bottom, -w, -wis.wi),
                bxdfs.pdf(p.top, -w, -wis.wi),
            )
            wt_ne = jnp.where(
                exit_specular, 1.0, power_heuristic(1.0, wis.pdf, 1.0, pdf_ne)
            )
            nee_ne = (
                beta
                * f_ne
                * vm.abs_cos_theta(wis.wi)[..., None]
                * wt_ne[..., None]
                * _tr(p.thickness, wis.wi)[..., None]
                * wis.f
                / jnp.maximum(wis.pdf, 1e-12)[..., None]
            )
            f_acc = f_acc + jnp.where(at_nonexit[..., None], nee_ne, 0.0)

            r, uc_n = _r1(r)
            r, u2_n = _r2(r)
            bs_ne = iface_sample(p.top, p.bottom, nonexit_is_bottom, -w, uc_n, u2_n,
                                 allow_refl=True, allow_trans=False)
            ok_ne = bs_ne.valid & jnp.any(bs_ne.f > 0, -1) & (bs_ne.pdf > 0) & (
                bs_ne.wi[..., 2] != 0
            )
            beta_ne = beta * bs_ne.f * vm.abs_cos_theta(bs_ne.wi)[..., None] / jnp.maximum(
                bs_ne.pdf, 1e-12
            )[..., None]
            # post-resample exit NEE
            f_exit2 = exit_f(-bs_ne.wi, wi, exit_is_bottom)
            pdf_exit2 = exit_pdf_trans(-bs_ne.wi, wi, exit_is_bottom)
            wt3 = jnp.where(
                nonexit_specular, 1.0, power_heuristic(1.0, bs_ne.pdf, 1.0, pdf_exit2)
            )
            nee3 = beta_ne * _tr(p.thickness, bs_ne.wi)[..., None] * f_exit2 * wt3[..., None]
            f_acc = f_acc + jnp.where((at_nonexit & ok_ne)[..., None], nee3, 0.0)

            # merge state updates
            new_alive = (
                (scatter & ok_ph)
                | (at_exit & ok_exit)
                | (at_nonexit & ok_ne)
            )
            new_beta = jnp.where(
                scatter[..., None],
                beta_sc,
                jnp.where(at_exit[..., None], beta_exit, beta_ne),
            )
            new_w = jnp.where(
                scatter[..., None],
                w_sc,
                jnp.where(at_exit[..., None], bs_exit.wi, bs_ne.wi),
            )
            new_z = jnp.where(scatter, z_sc, z_b)
            beta = jnp.where(new_alive[..., None], new_beta, beta)
            w = jnp.where(new_alive[..., None], new_w, w)
            z = jnp.where(new_alive, new_z, z)
            return (r, f_acc, beta, z, w, new_alive)

        carry = (r, f_acc, beta, z, w, alive)
        # fori_loop, NOT a python unroll: the walk body inlined max_depth
        # times (x3 entry points) made XLA's optimizer superlinear — a
        # coateddiffuse scene's fused render took 14 min to COMPILE on
        # XLA:CPU and timed out the chip tunnel (round-4 staircase scene)
        carry = jax.lax.fori_loop(0, p.max_depth, body, carry)
        r, f_acc, beta, z, w, alive = carry

    return f_acc / p.n_samples


def layered_sample(p: LayeredParams, wo, uc, u2):
    """Stochastic sample (layered_bxdf.h:247-372). Returns BSDFSample."""
    flip = wo[..., 2] < 0.0
    wo_f = jnp.where(flip[..., None], -wo, wo)

    bs0 = bxdfs.sample(p.top, wo_f, uc, u2)
    ok0 = bs0.valid & jnp.any(bs0.f > 0, -1) & (bs0.pdf > 0) & (bs0.wi[..., 2] != 0)
    is_refl0 = ~bxdfs.is_transmission(bs0.flags)

    # immediate reflection exits right away
    refl_done = ok0 & is_refl0
    out_f = bs0.f
    out_wi = jnp.where(flip[..., None], -bs0.wi, bs0.wi)
    out_pdf = bs0.pdf
    out_flags = bs0.flags

    # transmitted into the layer: random walk
    r = _rng_from(_hash_vec3(wo_f), _hash_uc_u2(uc, u2))
    walking = ok0 & ~is_refl0
    f_cur = bs0.f * vm.abs_cos_theta(bs0.wi)[..., None]
    pdf_cur = bs0.pdf
    spec_path = bxdfs.is_specular(bs0.flags)
    w = bs0.wi
    z = jnp.broadcast_to(p.thickness, wo.shape[:-1])
    has_albedo = jnp.any(p.albedo > 0, -1)

    done = jnp.zeros_like(walking)  # exited with a final sample
    exit_f_val = jnp.zeros_like(f_cur)
    exit_wi = w
    exit_pdf = jnp.ones_like(pdf_cur)
    exit_spec = spec_path

    def body(depth, carry):
        (r, walking, done, f_cur, pdf_cur, spec_path, w, z,
         exit_f_val, exit_wi, exit_pdf, exit_spec) = carry
        # RR
        rr_beta = jnp.max(f_cur, -1) / jnp.maximum(pdf_cur, 1e-12)
        r, u_rr = _r1(r)
        rr_on = depth > 3
        q = jnp.maximum(0.0, 1.0 - rr_beta)
        trigger = rr_on & walking & (rr_beta < 0.25)
        kill = trigger & (u_rr < q)
        pdf_cur = jnp.where(trigger & ~kill, pdf_cur * (1.0 - q), pdf_cur)
        walking = walking & ~kill
        walking = walking & (w[..., 2] != 0)

        # medium
        r, u_d = _r1(r)
        dz = -jnp.log1p(-u_d) * jnp.abs(w[..., 2])
        zp = jnp.where(w[..., 2] > 0, z + dz, z - dz)
        scatter = walking & has_albedo & (zp > 0) & (zp < p.thickness)
        r, u_ph = _r2(r)
        wi_ph, pdf_ph = warps.sample_henyey_greenstein(-w, p.g, u_ph)
        ok_ph = (pdf_ph > 0) & (wi_ph[..., 2] != 0)
        f_sc = f_cur * p.albedo * pdf_ph[..., None]
        pdf_sc = pdf_cur * pdf_ph
        # boundary advance
        z_noal = jnp.where(z == p.thickness, 0.0, p.thickness)
        f_bnd = jnp.where(
            (walking & ~has_albedo)[..., None],
            f_cur * _tr(p.thickness, w)[..., None],
            f_cur,
        )
        z_bnd = jnp.where(has_albedo, jnp.clip(zp, 0.0, p.thickness), z_noal)

        # interface sample at boundary
        at_boundary = walking & ~scatter
        use_bottom = z_bnd == 0.0
        r, uc_i = _r1(r)
        r, u2_i = _r2(r)
        bs_t = bxdfs.sample(p.top, -w, uc_i, u2_i)
        bs_b = bxdfs.sample(p.bottom, -w, uc_i, u2_i)
        bs_f = jnp.where(use_bottom[..., None], bs_b.f, bs_t.f)
        bs_wi = jnp.where(use_bottom[..., None], bs_b.wi, bs_t.wi)
        bs_pdf = jnp.where(use_bottom, bs_b.pdf, bs_t.pdf)
        bs_flags = jnp.where(use_bottom, bs_b.flags, bs_t.flags)
        bs_valid = jnp.where(use_bottom, bs_b.valid, bs_t.valid)
        ok_if = bs_valid & jnp.any(bs_f > 0, -1) & (bs_pdf > 0) & (bs_wi[..., 2] != 0)

        f_if = f_bnd * bs_f
        pdf_if = pdf_cur * bs_pdf
        spec_if = spec_path & bxdfs.is_specular(bs_flags)
        transmitted = bxdfs.is_transmission(bs_flags)

        exiting = at_boundary & ok_if & transmitted
        # record exit
        newly_done = exiting & ~done
        exit_f_val = jnp.where(newly_done[..., None], f_if, exit_f_val)
        exit_wi = jnp.where(newly_done[..., None], bs_wi, exit_wi)
        exit_pdf = jnp.where(newly_done, pdf_if, exit_pdf)
        exit_spec = jnp.where(newly_done, spec_if, exit_spec)
        done = done | exiting

        # continue: scatter lanes or reflected-at-interface lanes
        cont_scatter = scatter & ok_ph
        cont_reflect = at_boundary & ok_if & ~transmitted
        new_walking = cont_scatter | cont_reflect
        f_cur = jnp.where(
            cont_scatter[..., None],
            f_sc,
            jnp.where(
                cont_reflect[..., None],
                f_if * vm.abs_cos_theta(bs_wi)[..., None],
                f_cur,
            ),
        )
        pdf_cur = jnp.where(cont_scatter, pdf_sc, jnp.where(cont_reflect, pdf_if, pdf_cur))
        spec_path = jnp.where(cont_scatter, False, jnp.where(cont_reflect, spec_if, spec_path))
        w = jnp.where(
            cont_scatter[..., None], wi_ph, jnp.where(cont_reflect[..., None], bs_wi, w)
        )
        z = jnp.where(cont_scatter, zp, z_bnd)
        return (r, new_walking, done, f_cur, pdf_cur, spec_path, w, z,
                exit_f_val, exit_wi, exit_pdf, exit_spec)

    carry = (r, walking, done, f_cur, pdf_cur, spec_path, w, z,
             exit_f_val, exit_wi, exit_pdf, exit_spec)
    # fori_loop, not a python unroll (see layered_f)
    carry = jax.lax.fori_loop(0, p.max_depth, body, carry)
    (r, walking, done, f_cur, pdf_cur, spec_path, w, z,
     exit_f_val, exit_wi, exit_pdf, exit_spec) = carry

    exit_wi_o = jnp.where(flip[..., None], -exit_wi, exit_wi)
    same_out = jnp.sum(wo_f * exit_wi, -1) * 0 + (wo_f[..., 2] * exit_wi[..., 2])
    walk_flags = jnp.where(
        wo_f[..., 2] * exit_wi[..., 2] > 0,
        bxdfs.F_REFLECTION,
        bxdfs.F_TRANSMISSION,
    ) | jnp.where(exit_spec, bxdfs.F_SPECULAR, bxdfs.F_GLOSSY)

    f_out = jnp.where(refl_done[..., None], out_f, exit_f_val)
    wi_out = jnp.where(refl_done[..., None], out_wi, exit_wi_o)
    pdf_out = jnp.where(refl_done, out_pdf, exit_pdf)
    flags_out = jnp.where(refl_done, out_flags, walk_flags).astype(jnp.int32)
    valid = refl_done | done
    return bxdfs.BSDFSample(
        f=f_out, wi=wi_out, pdf=pdf_out, flags=flags_out,
        eta=jnp.ones_like(pdf_out), valid=valid,
    )


def layered_pdf(p: LayeredParams, wo, wi):
    """Stochastic pdf estimate (layered_bxdf.h:375-470), simplified to the
    dominant TRT estimator: entrance reflection pdf + one MIS'd
    transmission-reflection-transmission sample per nSamples. The pdf only
    steers MIS weights, so a coarser estimate changes variance, not bias
    (pbrt-v4 makes the same argument for its stochastic pdf)."""
    flip = wo[..., 2] < 0.0
    wo = jnp.where(flip[..., None], -wo, wo)
    wi = jnp.where(flip[..., None], -wi, wi)
    same = wo[..., 2] * wi[..., 2] > 0.0

    pdf_sum = jnp.where(
        same,
        p.n_samples * bxdfs.pdf(p.top, wo, wi, allow_refl=True, allow_trans=False),
        0.0,
    )

    r = _rng_from(_hash_vec3(wi), _hash_vec3(wo))
    for _s in range(p.n_samples):
        r, uc1 = _r1(r)
        r, u21 = _r2(r)
        wos = bxdfs.sample(p.top, wo, uc1, u21, allow_refl=False, allow_trans=True)
        r, uc2 = _r1(r)
        r, u22 = _r2(r)
        wis = bxdfs.sample(p.top, wi, uc2, u22, allow_refl=False, allow_trans=True)
        ok = (
            wos.valid & (wos.pdf > 0) & jnp.any(wos.f > 0, -1)
            & wis.valid & (wis.pdf > 0) & jnp.any(wis.f > 0, -1)
        )
        r_pdf = bxdfs.pdf(p.bottom, -wos.wi, -wis.wi)
        pdf_sum = pdf_sum + jnp.where(same & ok, r_pdf, 0.0)

    # lerp with uniform sphere pdf (pbrt: blend for robustness)
    return 0.9 * pdf_sum / p.n_samples + 0.1 / (4.0 * jnp.pi)
