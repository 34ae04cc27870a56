"""SceneBuilder: .pbrt token stream -> host-side scene description.

Counterpart of reference scene/scene_builder.cu (1,290 LoC): the graphics-
state machine (CTM stack, current material/area-light/medium), directive
dispatch, and object factories. Unlike the reference (which placement-news
polymorphic device objects), this builder produces plain python/numpy specs;
`pbrt_tpu.scene.compile_scene` flattens them into the `SceneArrays` pytree
the jitted renderer consumes.

Directive coverage mirrors scene_builder.cu:287-469.
"""
import copy
import os
import functools
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pbrt_tpu.scene import lexer as lx
from pbrt_tpu.scene.params import ParameterDict, parse_parameters
from pbrt_tpu.geometry import transform as tf
from pbrt_tpu.spectral import cie, spectra

# material type codes (device dispatch)
MAT_INTERFACE = -1
MAT_DIFFUSE = 0
MAT_CONDUCTOR = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_TRANSMISSION = 3
MAT_COATED_DIFFUSE = 4
MAT_COATED_CONDUCTOR = 5
MAT_MIX = 6

LIGHT_AREA = 0
LIGHT_DISTANT = 1
LIGHT_UNIFORM_INFINITE = 2
LIGHT_IMAGE_INFINITE = 3
LIGHT_SPOT = 4


@functools.lru_cache(None)
def named_spectra():
    """Built-in named spectra (reference scene_builder.cu:100-136):
    metal eta/k and glass eta as dense rows, unnormalized piecewise-linear."""
    import pathlib

    data = pathlib.Path(__file__).resolve().parent.parent / "data"
    out = {}
    metal = np.load(data / "metal.npz")
    for m in ["Ag", "Al", "Au", "Cu"]:
        out[f"metal-{m}-eta"] = spectra.from_interleaved(metal[f"{m}_eta"], False)
        out[f"metal-{m}-k"] = spectra.from_interleaved(metal[f"{m}_k"], False)
    glass = np.load(data / "glass.npz")
    out["glass-BK7"] = spectra.from_interleaved(glass["GlassBK7_eta"], False)
    out["glass-SF11"] = spectra.from_interleaved(glass["GlassSF11_eta"], False)
    return out


@dataclass
class MaterialSpec:
    type: int
    # rgb-based reflectance kept as rgb (differentiable via rgb2spec lookup
    # at compile/jit time)
    reflectance_rgb: Optional[np.ndarray] = None
    reflectance_tex: Optional[int] = None   # spectrum texture index
    eta_spec: int = -1                      # dense spectrum row
    k_spec: int = -1
    eta_float: float = 1.5
    eta_is_constant: bool = True
    uroughness: float = 0.0
    vroughness: float = 0.0
    remap_roughness: bool = True
    # coated / transmission extras
    thickness: float = 0.01
    g: float = 0.0
    albedo_rgb: Optional[np.ndarray] = None
    max_depth: int = 10
    n_samples: int = 1
    interface_eta: float = 1.5
    # diffuse transmission
    transmittance_rgb: Optional[np.ndarray] = None
    # mix
    mix_m1: int = -1
    mix_m2: int = -1
    mix_amount: float = 0.5
    conductor_eta_spec: int = -1
    conductor_k_spec: int = -1
    crough_u: float = 0.0
    crough_v: float = 0.0
    # texture slots (node index into SceneBuilder.textures, -1 = use constant)
    refl_tex: int = -1
    trans_tex: int = -1
    urough_tex: int = -1
    vrough_tex: int = -1


@dataclass
class AreaLightSpec:
    emission_dense: np.ndarray  # (471,) scale/photometric already applied EXCEPT user scale
    scale: float
    two_sided: bool


@dataclass
class LightSpec:
    type: int
    emission_dense: np.ndarray
    scale: float
    two_sided: bool = False
    tri_index: int = -1
    sphere_index: int = -1
    # distant / spot
    direction: Optional[np.ndarray] = None
    position: Optional[np.ndarray] = None
    cos_falloff_start: float = 0.0
    cos_falloff_end: float = 0.0
    disk_index: int = -1
    # image infinite
    image: Optional[np.ndarray] = None
    light_from_render: Optional[np.ndarray] = None
    render_from_light: Optional[np.ndarray] = None
    # graphics-state exterior medium at creation (reference base/light.cu
    # factory passes the state medium to every light ctor); light subpaths
    # start their walk in this medium
    medium: int = -1


@dataclass
class GraphicsState:
    ctm: np.ndarray = field(default_factory=tf.identity)
    material_idx: int = 0
    area_light: Optional[AreaLightSpec] = None
    reverse_orientation: bool = False
    inside_medium: int = -1
    outside_medium: int = -1


def _swaps_handedness(m):
    return np.linalg.det(np.asarray(m)[:3, :3]) < 0


class SceneBuilder:
    def __init__(self):
        self.state = GraphicsState()
        self.stack = []
        self.in_world = False
        # file lookups resolve relative to the .pbrt's directory once
        # parse_file runs; token-string parses resolve from cwd (absolute
        # paths pass through os.path.join unchanged)
        self._search_dir = "."

        # outputs
        self.materials = [MaterialSpec(type=MAT_DIFFUSE, reflectance_rgb=np.array([0.5, 0.5, 0.5]))]
        self.named_materials = {}
        self.spectra_rows = []  # list of (471,) float64
        self._spectra_index = {}
        self.tri_p = []      # (n,3,3) per mesh flattened later
        self.tri_n = []
        self.tri_uv = []
        self.tri_mat = []
        self.tri_light = []
        self.tri_rev = []
        self.tri_med = []    # (inside, outside) medium index per tri
        self.spheres = []    # dict(center, radius, mat, light, rev)
        self.disks = []      # dict(center, normal, radius, inner, mat, light)
        self.lights = []     # LightSpec
        self.float_textures = {}
        self.spectrum_textures = {}
        self.textures = []           # list[TexSpec] flat node table
        self._texture_index = {}     # (name, is_spectrum) -> node index
        self.media = []              # dicts: sigma_a/sigma_s dense, g
        self.named_media = {}
        self.camera_medium = -1      # exterior medium at WorldBegin
        # object instancing (reference scene_builder.cu:809-876): definitions
        # record world-space shape chunks; ObjectInstance re-emits them under
        # the instance CTM (flattened at build — geometry is shared on disk
        # but replicated in SceneArrays; a two-level BVH can replace this
        # without changing the .pbrt surface)
        self.object_defs = {}        # name -> dict(tris=[chunk], spheres=[], disks=[])
        self.active_object = None    # name while recording a definition
        self.named_coordinate_systems = {}
        # two-level BVH instancing outputs (compile.py builds a TLAS over
        # [static tris | instance AABBs] + one shared BLAS per prototype —
        # the reference's TransformedPrimitive + sub-BVH design,
        # scene_builder.cu:809-876). Mode:
        #   "auto"    — flatten small instances (cheap, keeps tiny scenes on
        #               the dense/static path), share geometry past
        #               AUTO_FLATTEN_TRIS total;
        #   "flatten" — always replay geometry (old behavior);
        #   "bvh"     — always share via the two-level BVH.
        self.instancing = "auto"
        self.protos = []             # per-proto per-tri column dicts
        self.instances = []          # dict(proto=idx, o2w=(3,4), swap=bool)
        self._proto_index = {}       # def name -> proto idx

        # configs (reference defaults, SURVEY.md §8 'Observed runtime defaults')
        self.film = {"xresolution": 1920, "yresolution": 1080, "filename": "out.png"}
        self.camera = {"type": "perspective", "fov": 90.0, "camera_from_world": tf.identity()}
        self.sampler = {"type": "stratified", "pixelsamples": 4}
        self.integrator = {"type": "path", "maxdepth": 5}
        self.filter = {"type": "mitchell"}
        self._camera_tokens_params = ParameterDict()

    # ------------------------------------------------------------- spectra

    def add_spectrum_row(self, dense, key=None):
        if key is not None and key in self._spectra_index:
            return self._spectra_index[key]
        idx = len(self.spectra_rows)
        self.spectra_rows.append(np.asarray(dense, dtype=np.float64))
        if key is not None:
            self._spectra_index[key] = idx
        return idx

    def resolve_spectrum(self, pd: ParameterDict, name):
        """Resolve a 'spectrum'-typed parameter to a dense row index, or None.

        (reference parameter_dictionary get_spectrum for non-rgb cases)."""
        raw = pd.get_spectrum_raw(name)
        if raw is None:
            if name in pd and pd.type_of(name) == "blackbody":
                T = pd.get_blackbody(name)
                return self.add_spectrum_row(spectra.blackbody(T), key=("bb", T))
            return None
        kind, val = raw
        if kind == "named":
            reg = named_spectra()
            if val not in reg:
                raise ValueError(f"unknown named spectrum {val!r}")
            return self.add_spectrum_row(reg[val], key=("named", val))
        return self.add_spectrum_row(spectra.from_interleaved(val, False))

    def illuminant_dense(self, pd: ParameterDict, name):
        """Resolve an Illuminant-type spectrum parameter ('L' etc.) to a dense
        emission row (reference SpectrumType::Illuminant resolution) and its
        photometric norm <s, Y>.

        RGB case: scale=2*max(rgb), sigmoid-fit rgb/scale, multiplied by the
        color space illuminant; to_photometric uses the ILLUMINANT's <D65n,Y>
        (reference rgb_illuminant_spectrum.cu:27-28)."""
        rgb = pd.get_rgb(name)
        if rgb is not None:
            from pbrt_tpu.spectral import rgb2spec

            s = 2.0 * float(np.max(rgb))
            if s == 0.0:
                dense = np.zeros(cie.LAMBDA_RANGE)
                return dense, cie.CIE_Y_INTEGRAL
            c = rgb2spec.rgb_to_coefficients_np(rgb / s).astype(np.float64)
            lam = cie.lambdas()
            x = (c[0] * lam + c[1]) * lam + c[2]
            sig = 0.5 * x / np.sqrt(1.0 + x * x) + 0.5
            dense = s * sig * cie.illum_d65()
            return dense, cie.inner_product(cie.illum_d65(), cie.Y())
        spec_idx = self.resolve_spectrum(pd, name)
        if spec_idx is not None:
            dense = self.spectra_rows[spec_idx]
            return dense, cie.inner_product(dense, cie.Y())
        # default: color space illuminant (reference diffuse_area_light.cu:21-23)
        dense = cie.illum_d65()
        return dense, cie.inner_product(dense, cie.Y())

    # ------------------------------------------------------------ textures

    def _const_tex(self, is_spectrum, rgb=None, value=0.0):
        from pbrt_tpu.textures.textures import TexSpec

        self.textures.append(
            TexSpec(kind="constant", is_spectrum=is_spectrum, rgb=rgb, value=value)
        )
        return len(self.textures) - 1

    def _child_tex(self, pd: ParameterDict, name, is_spectrum, default=None):
        """Resolve a tex1/tex2/amount param that may be a texture name, an
        rgb/float constant, or absent -> node index or -1."""
        tn = pd.get_texture_name(name)
        if tn is not None:
            return self.texture_index(tn, is_spectrum)
        if is_spectrum:
            rgb = pd.get_rgb(name)
            if rgb is not None:
                return self._const_tex(True, rgb=np.asarray(rgb))
            v = pd.get_float(name, None)
            if v is not None:
                return self._const_tex(True, rgb=np.array([v, v, v]))
        else:
            v = pd.get_float(name, None)
            if v is not None:
                return self._const_tex(False, value=float(v))
        if default is not None:
            if is_spectrum:
                return self._const_tex(True, rgb=np.array([default] * 3))
            return self._const_tex(False, value=float(default))
        return -1

    def texture_index(self, name, is_spectrum):
        """Named texture -> node index in self.textures, building (and
        resolving children) on first use. Counterpart of reference
        base/spectrum_texture.cu:15-50 / base/float_texture.cu:11-24
        factories."""
        key = (name, is_spectrum)
        if key in self._texture_index:
            return self._texture_index[key]
        table = self.spectrum_textures if is_spectrum else self.float_textures
        if name not in table:
            # pbrt allows float textures referenced from spectrum slots
            other = self.float_textures if is_spectrum else self.spectrum_textures
            if name in other:
                table = other
            else:
                raise ValueError(f"unknown texture {name!r}")
        tclass, pd, tex_ctm = table[name]
        from pbrt_tpu.textures.textures import TexSpec

        mapping = pd.get_string("mapping", "uv")
        if mapping not in ("uv", "spherical", "cylindrical", "planar"):
            raise ValueError(f"texture mapping {mapping!r} not supported")
        spec = TexSpec(
            kind=tclass,
            is_spectrum=is_spectrum,
            uscale=pd.get_float("uscale", 1.0),
            vscale=pd.get_float("vscale", 1.0),
            udelta=pd.get_float("udelta", 0.0),
            vdelta=pd.get_float("vdelta", 0.0),
            mapping=mapping,
            v1=np.asarray(pd.get_vector3("v1", np.array([1.0, 0.0, 0.0]))),
            v2=np.asarray(pd.get_vector3("v2", np.array([0.0, 1.0, 0.0]))),
            # world->texture transform captured at Texture declaration
            # (reference texture_mapping_2d: points mapped to texture space)
            tex_from_world=np.linalg.inv(tex_ctm),
        )
        if tclass == "constant":
            rgb = pd.get_rgb("value")
            v = pd.get_float("value", 1.0)
            if is_spectrum:
                spec.rgb = np.asarray(rgb) if rgb is not None else np.array([v, v, v])
            else:
                spec.value = float(v)
        elif tclass == "imagemap":
            spec.filename = pd.get_string("filename")
            spec.image_scale = pd.get_float("scale", 1.0)
            spec.invert = pd.get_bool("invert", False)
            spec.wrap = pd.get_string("wrap", "repeat")
        elif tclass == "scale":
            spec.tex1 = self._child_tex(pd, "tex", is_spectrum, default=1.0)
            spec.amount_tex = self._child_tex(pd, "scale", False)
            spec.amount = pd.get_float("scale", 1.0)
        elif tclass == "mix":
            spec.tex1 = self._child_tex(pd, "tex1", is_spectrum, default=0.0)
            spec.tex2 = self._child_tex(pd, "tex2", is_spectrum, default=1.0)
            spec.amount_tex = self._child_tex(pd, "amount", False)
            spec.amount = pd.get_float("amount", 0.5)
        elif tclass == "checkerboard":
            spec.tex1 = self._child_tex(pd, "tex1", is_spectrum, default=0.0)
            spec.tex2 = self._child_tex(pd, "tex2", is_spectrum, default=1.0)
        elif tclass == "directionmix":
            spec.tex1 = self._child_tex(pd, "tex1", is_spectrum, default=0.0)
            spec.tex2 = self._child_tex(pd, "tex2", is_spectrum, default=1.0)
            d = pd.get_vector3("dir", np.array([0.0, 1.0, 0.0]))
            spec.dir = tex_ctm[:3, :3] @ np.asarray(d)
        else:
            raise ValueError(f"texture class {tclass!r} not supported")
        self.textures.append(spec)
        idx = len(self.textures) - 1
        self._texture_index[key] = idx
        return idx

    def _spectrum_tex_param(self, pd: ParameterDict, name):
        """-> texture node index for a spectrum material param, or None if
        the param is a constant (kept in the material table directly)."""
        tn = pd.get_texture_name(name)
        if tn is None:
            return None
        return self.texture_index(tn, True)

    def _float_tex_param(self, pd: ParameterDict, name):
        tn = pd.get_texture_name(name)
        if tn is None:
            return None
        return self.texture_index(tn, False)

    # -------------------------------------------------------------- media

    def make_medium(self, pd: ParameterDict) -> int:
        """Homogeneous medium (reference medium/homogeneous_medium.cu:15-38):
        sigma_a/sigma_s unbounded spectra (default constant 1), x scale; HG g.
        Returns medium table index."""
        def sigma_of(name, default):
            rgb = pd.get_rgb(name)
            if rgb is not None:
                from pbrt_tpu.spectral import rgb2spec

                m = float(np.max(rgb))
                sc = 2.0 * m if m > 0 else 1.0
                c = rgb2spec.rgb_to_coefficients_np(
                    np.asarray(rgb) / sc if m > 0 else np.zeros(3)
                ).astype(np.float64)
                lam = cie.lambdas()
                x = (c[0] * lam + c[1]) * lam + c[2]
                sig = 0.5 * x / np.sqrt(1.0 + x * x) + 0.5
                return sc * sig
            idx = self.resolve_spectrum(pd, name)
            if idx is not None:
                return self.spectra_rows[idx]
            v = pd.get_float(name, default)
            return np.full(cie.LAMBDA_RANGE, v)

        scale = pd.get_float("scale", 1.0)
        self.media.append(
            dict(
                sigma_a=sigma_of("sigma_a", 1.0) * scale,
                sigma_s=sigma_of("sigma_s", 1.0) * scale,
                g=pd.get_float("g", 0.0),
            )
        )
        return len(self.media) - 1

    # ------------------------------------------------------------ materials

    def make_material(self, mtype: str, pd: ParameterDict) -> int:
        """Create a MaterialSpec (reference base/material.cu:34-76 factory +
        per-material ctors) and return its index."""
        if mtype in ("", "interface", "none"):
            return -1
        spec = None
        def tex_or(pd_, name, spectrum=True):
            t = (self._spectrum_tex_param if spectrum else self._float_tex_param)(pd_, name)
            return -1 if t is None else t

        if mtype == "diffuse":
            rgb = pd.get_rgb("reflectance", np.array([0.5, 0.5, 0.5]))
            spec = MaterialSpec(
                type=MAT_DIFFUSE,
                reflectance_rgb=np.asarray(rgb),
                refl_tex=tex_or(pd, "reflectance"),
            )
        elif mtype == "conductor":
            eta_idx = self.resolve_spectrum(pd, "eta")
            k_idx = self.resolve_spectrum(pd, "k")
            refl = pd.get_rgb("reflectance")
            if refl is None and eta_idx is None:
                reg = named_spectra()
                eta_idx = self.add_spectrum_row(reg["metal-Cu-eta"], key=("named", "metal-Cu-eta"))
            if refl is None and k_idx is None:
                reg = named_spectra()
                k_idx = self.add_spectrum_row(reg["metal-Cu-k"], key=("named", "metal-Cu-k"))
            rough = pd.get_float("roughness", 0.0)
            rtex = tex_or(pd, "roughness", spectrum=False)
            spec = MaterialSpec(
                type=MAT_CONDUCTOR,
                reflectance_rgb=None if refl is None else np.asarray(refl),
                refl_tex=tex_or(pd, "reflectance"),
                eta_spec=-1 if eta_idx is None else eta_idx,
                k_spec=-1 if k_idx is None else k_idx,
                uroughness=pd.get_float("uroughness", rough),
                vroughness=pd.get_float("vroughness", rough),
                urough_tex=tex_or(pd, "uroughness", spectrum=False) if pd.get_texture_name("uroughness") else rtex,
                vrough_tex=tex_or(pd, "vroughness", spectrum=False) if pd.get_texture_name("vroughness") else rtex,
                remap_roughness=pd.get_bool("remaproughness", True),
            )
        elif mtype == "dielectric":
            # "float eta" -> constant IOR; "spectrum eta" (e.g. glass-BK7)
            # -> dispersive (dielectric_material.cu:40-60 both forms)
            eta_f = (pd.get_float("eta", None)
                     if ("eta" not in pd or pd.type_of("eta") == "float")
                     else None)
            eta_idx = None
            if eta_f is None:
                eta_idx = self.resolve_spectrum(pd, "eta")
            rough = pd.get_float("roughness", 0.0)
            rtex = tex_or(pd, "roughness", spectrum=False)
            spec = MaterialSpec(
                type=MAT_DIELECTRIC,
                eta_float=1.5 if eta_f is None else float(eta_f),
                eta_spec=-1 if eta_idx is None else eta_idx,
                eta_is_constant=eta_idx is None,
                uroughness=pd.get_float("uroughness", rough),
                vroughness=pd.get_float("vroughness", rough),
                urough_tex=tex_or(pd, "uroughness", spectrum=False) if pd.get_texture_name("uroughness") else rtex,
                vrough_tex=tex_or(pd, "vroughness", spectrum=False) if pd.get_texture_name("vroughness") else rtex,
                remap_roughness=pd.get_bool("remaproughness", True),
            )
        elif mtype == "diffusetransmission":
            spec = MaterialSpec(
                type=MAT_DIFFUSE_TRANSMISSION,
                reflectance_rgb=np.asarray(pd.get_rgb("reflectance", np.array([0.25, 0.25, 0.25]))),
                transmittance_rgb=np.asarray(
                    pd.get_rgb("transmittance", np.array([0.25, 0.25, 0.25]))
                ),
                refl_tex=tex_or(pd, "reflectance"),
                trans_tex=tex_or(pd, "transmittance"),
            )
        elif mtype == "coateddiffuse":
            rough = pd.get_float("roughness", 0.0)
            spec = MaterialSpec(
                type=MAT_COATED_DIFFUSE,
                reflectance_rgb=np.asarray(pd.get_rgb("reflectance", np.array([0.5, 0.5, 0.5]))),
                refl_tex=tex_or(pd, "reflectance"),
                uroughness=pd.get_float("uroughness", rough),
                vroughness=pd.get_float("vroughness", rough),
                remap_roughness=pd.get_bool("remaproughness", True),
                thickness=pd.get_float("thickness", 0.01),
                interface_eta=pd.get_float("eta", 1.5),
                g=pd.get_float("g", 0.0),
                albedo_rgb=np.asarray(pd.get_rgb("albedo", np.array([0.0, 0.0, 0.0]))),
                max_depth=pd.get_integer("maxdepth", 10),
                n_samples=pd.get_integer("nsamples", 1),
            )
        elif mtype == "coatedconductor":
            irough = pd.get_float("interface.roughness", 0.0)
            crough = pd.get_float("conductor.roughness", 0.0)
            ceta = self.resolve_spectrum(pd, "conductor.eta")
            ck = self.resolve_spectrum(pd, "conductor.k")
            reg = named_spectra()
            if ceta is None:
                ceta = self.add_spectrum_row(reg["metal-Cu-eta"], key=("named", "metal-Cu-eta"))
            if ck is None:
                ck = self.add_spectrum_row(reg["metal-Cu-k"], key=("named", "metal-Cu-k"))
            spec = MaterialSpec(
                type=MAT_COATED_CONDUCTOR,
                uroughness=pd.get_float("interface.uroughness", irough),
                vroughness=pd.get_float("interface.vroughness", irough),
                remap_roughness=pd.get_bool("remaproughness", True),
                thickness=pd.get_float("thickness", 0.01),
                interface_eta=pd.get_float("interface.eta", 1.5),
                g=pd.get_float("g", 0.0),
                albedo_rgb=np.asarray(pd.get_rgb("albedo", np.array([0.0, 0.0, 0.0]))),
                max_depth=pd.get_integer("maxdepth", 10),
                n_samples=pd.get_integer("nsamples", 1),
                conductor_eta_spec=ceta,
                conductor_k_spec=ck,
                crough_u=pd.get_float("conductor.uroughness", crough),
                crough_v=pd.get_float("conductor.vroughness", crough),
            )
        elif mtype == "mix":
            names = pd._get("materials", {"string"}, None)
            if names is None or len(names) != 2:
                raise ValueError("mix material needs 2 named materials")
            m1 = self.named_materials[names[0]]
            m2 = self.named_materials[names[1]]
            spec = MaterialSpec(
                type=MAT_MIX,
                mix_m1=m1,
                mix_m2=m2,
                mix_amount=pd.get_float("amount", 0.5),
            )
        else:
            raise ValueError(f"material type {mtype!r} not implemented")
        self.materials.append(spec)
        return len(self.materials) - 1

    # -------------------------------------------------------------- shapes

    def add_triangle_mesh(self, pd: ParameterDict):
        """reference shapes/triangle_mesh.cu + base/shape.cu trianglemesh."""
        P = pd.get_points3("P")
        indices = pd.get_integers("indices")
        if P is None or indices is None:
            raise ValueError("trianglemesh needs P and indices")
        N = pd.get_normals("N")
        UV = pd.get_points2("uv")
        self._emit_mesh(P, np.asarray(indices).reshape(-1, 3), N, UV)

    def _emit_mesh(self, P, idx, N=None, UV=None):
        ctm = self.state.ctm
        Pw = (P @ ctm[:3, :3].T) + ctm[:3, 3]
        Nw = None
        if N is not None:
            inv = np.linalg.inv(ctm)
            Nw = N @ inv[:3, :3]
            norms = np.linalg.norm(Nw, axis=-1, keepdims=True)
            Nw = Nw / np.maximum(norms, 1e-30)
        rev = self.state.reverse_orientation ^ _swaps_handedness(ctm)
        if Nw is not None and rev:
            Nw = -Nw

        med = (self.state.inside_medium, self.state.outside_medium)
        if self.active_object is not None:
            # record the chunk in world-of-definition space; instances
            # re-transform it (reference builds a per-definition sub-BVH,
            # scene_builder.cu:70-90 — here the geometry is replayed instead)
            if self.state.area_light is not None:
                raise ValueError(
                    "area lights inside ObjectBegin/ObjectEnd are not supported"
                )
            self.object_defs[self.active_object]["tris"].append(
                dict(P=Pw, idx=np.asarray(idx), N=Nw, UV=UV,
                     mat=self.state.material_idx, rev=rev, med=med)
            )
            return
        self._append_tris(Pw, idx, Nw, UV, self.state.material_idx, rev, med,
                          area_light=self.state.area_light)

    def _append_tris(self, Pw, idx, Nw, UV, mat, rev, med, area_light=None):
        for tri in idx:
            li = -1
            if area_light is not None:
                al = area_light
                self.lights.append(
                    LightSpec(
                        type=LIGHT_AREA,
                        emission_dense=al.emission_dense,
                        scale=al.scale,
                        two_sided=al.two_sided,
                        tri_index=len(self.tri_p), medium=self.state.outside_medium)
                )
                li = len(self.lights) - 1
            self.tri_p.append(Pw[tri])
            self.tri_n.append(None if Nw is None else Nw[tri])
            self.tri_uv.append(None if UV is None else UV[tri])
            self.tri_mat.append(mat)
            self.tri_light.append(li)
            self.tri_rev.append(rev)
            self.tri_med.append(med)

    # "flatten" mode: hard cap before we refuse to replay geometry (auto
    # mode never reaches it — defs promote to shared prototypes first)
    MAX_FLATTENED_TRIS = 4_000_000
    # "auto" mode: replay (flatten) instances while the scene stays under
    # this many triangles — small scenes traverse faster single-level —
    # then promote the definition to a shared prototype + two-level BVH
    AUTO_FLATTEN_TRIS = 262_144

    def _promote_proto(self, name):
        """Register object_defs[name]'s triangle chunks as a shared
        prototype: per-TRIANGLE columns in definition space, consumed by
        compile.py's two-level BVH branch (the reference's per-definition
        sub-BVH, scene_builder.cu:70-90 + primitives/transformed_primitive.h)."""
        if name in self._proto_index:
            return self._proto_index[name]
        d = self.object_defs[name]
        default_uv = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        Ps, Ns, UVs, hn, mats, revs, meds = [], [], [], [], [], [], []
        for c in d["tris"]:
            idx = np.asarray(c["idx"]).reshape(-1, 3)
            n = idx.shape[0]
            Ps.append(np.asarray(c["P"])[idx])
            if c["N"] is not None:
                Ns.append(np.asarray(c["N"])[idx])
                hn.append(np.ones(n, bool))
            else:
                Ns.append(np.zeros((n, 3, 3)))
                hn.append(np.zeros(n, bool))
            if c["UV"] is not None:
                UVs.append(np.asarray(c["UV"])[idx])
            else:
                UVs.append(np.tile(default_uv, (n, 1, 1)))
            mats.append(np.full(n, c["mat"], np.int32))
            revs.append(np.full(n, c["rev"], bool))
            meds.append(np.tile(np.asarray(c["med"], np.int32), (n, 1)))
        self.protos.append(dict(
            P=np.concatenate(Ps),
            N=np.concatenate(Ns),
            UV=np.concatenate(UVs),
            has_n=np.concatenate(hn),
            mat=np.concatenate(mats),
            rev=np.concatenate(revs),
            med=np.concatenate(meds),
        ))
        self._proto_index[name] = len(self.protos) - 1
        return self._proto_index[name]

    def _emit_instance(self, name):
        """ObjectInstance: replay a recorded definition under the current CTM
        (final transform = CTM_instance . CTM_definition, exactly the
        reference's TransformedPrimitive composition scene_builder.cu:856-876).

        Triangle payload routing (self.instancing): small scenes flatten
        (replay world-space copies — fastest single-level traversal); large
        or forced ("bvh") scenes share one prototype per definition and
        record only (proto, o2w, swap) — the reference's
        TransformedPrimitive design. Quadrics always flatten (analytic,
        cheap)."""
        if name not in self.object_defs:
            raise ValueError(f"ObjectInstance {name!r} not defined")
        ctm = self.state.ctm
        M = ctm[:3, :3]
        t = ctm[:3, 3]
        inv = np.linalg.inv(ctm)
        swap = _swaps_handedness(ctm)
        d = self.object_defs[name]
        n_new = sum(len(c["idx"]) for c in d["tris"])
        mode = self.instancing
        use_proto = bool(d["tris"]) and (
            mode == "bvh"
            or (mode == "auto"
                and (name in self._proto_index
                     or len(self.tri_p) + n_new > self.AUTO_FLATTEN_TRIS))
        )
        if use_proto:
            p = self._promote_proto(name)
            self.instances.append(dict(
                proto=p, o2w=np.asarray(ctm[:3, :4], np.float64).copy(),
                swap=bool(swap),
            ))
        else:
            if len(self.tri_p) + n_new > self.MAX_FLATTENED_TRIS:
                raise NotImplementedError(
                    "instancing='flatten' replays past MAX_FLATTENED_TRIS; "
                    "use instancing='auto'/'bvh' (two-level BVH)"
                )
            for c in d["tris"]:
                Pw = c["P"] @ M.T + t
                Nw = None
                if c["N"] is not None:
                    Nw = c["N"] @ inv[:3, :3]
                    Nw = Nw / np.maximum(
                        np.linalg.norm(Nw, axis=-1, keepdims=True), 1e-30)
                    if swap:
                        Nw = -Nw
                self._append_tris(Pw, c["idx"], Nw, c["UV"], c["mat"],
                                  c["rev"] ^ swap, c["med"])
        for s in d["spheres"]:
            sc = abs(np.linalg.det(M)) ** (1.0 / 3.0)
            rot_i = M / max(sc, 1e-30)
            if not np.allclose(rot_i @ rot_i.T, np.eye(3), atol=1e-4):
                raise ValueError("sphere instances support uniform scaling only")
            self.spheres.append(dict(
                s, center=np.asarray(s["center"]) @ M.T + t,
                radius=s["radius"] * sc, rot=rot_i @ s["rot"],
                zmin=s["zmin"] * sc, zmax=s["zmax"] * sc,
                # mirrored instances flip orientation, same composition as
                # the triangle path's rev ^ swap above
                rev=s.get("rev", False) ^ swap,
            ))
        for dk in d["disks"]:
            sc = abs(np.linalg.det(M)) ** (1.0 / 3.0)
            n2 = dk["normal"] @ inv[:3, :3]
            n2 = n2 / max(np.linalg.norm(n2), 1e-30)
            if swap:
                # reflecting CTM: the disk shades/emits on the flipped side
                # (mirror of the triangle rev ^ swap composition)
                n2 = -n2
            xax = M @ dk["xaxis"]
            xax = xax / max(np.linalg.norm(xax), 1e-30)
            self.disks.append(dict(dk, center=np.asarray(dk["center"]) @ M.T + t,
                                   normal=n2, radius=dk["radius"] * sc,
                                   inner=dk["inner"] * sc,
                                   xaxis=xax, yaxis=np.cross(n2, xax)))

    def add_sphere(self, pd: ParameterDict):
        """reference shapes/sphere.cu:13-26: radius + optional zmin/zmax
        clipping and phimax (partial spheres)."""
        radius = pd.get_float("radius", 1.0)
        ctm = self.state.ctm
        center = ctm[:3, 3].copy()
        # rotation + uniform scale support: radius scales with cbrt(det);
        # the rotation part becomes the object frame for z/phi clipping
        det = np.linalg.det(ctm[:3, :3])
        s = abs(det) ** (1.0 / 3.0)
        rot = ctm[:3, :3] / max(s, 1e-30)
        if not np.allclose(rot @ rot.T, np.eye(3), atol=1e-4):
            raise NotImplementedError(
                "sphere with non-uniform-scale transform not supported yet"
            )
        z_min = max(min(pd.get_float("zmin", -radius), radius), -radius)
        z_max = min(max(pd.get_float("zmax", radius), -radius), radius)
        if z_min > z_max:
            z_min, z_max = z_max, z_min
        phi_max = np.deg2rad(np.clip(pd.get_float("phimax", 360.0), 0.0, 360.0))
        partial = (
            z_min > -radius + 1e-6 * radius
            or z_max < radius - 1e-6 * radius
            or phi_max < 2.0 * np.pi - 1e-6
        )
        if partial and self.state.area_light is not None:
            raise NotImplementedError("partial spheres as area lights not supported")
        extra = dict(
            rot=rot.astype(np.float64),
            zmin=z_min * s,
            zmax=z_max * s,
            phimax=float(phi_max),
            partial=partial,
        )
        li = -1
        if self.active_object is not None:
            if self.state.area_light is not None:
                raise ValueError(
                    "area lights inside ObjectBegin/ObjectEnd are not supported"
                )
            self.object_defs[self.active_object]["spheres"].append(
                dict(
                    center=center,
                    radius=radius * s,
                    mat=self.state.material_idx,
                    light=-1,
                    rev=self.state.reverse_orientation ^ _swaps_handedness(ctm),
                    med=(self.state.inside_medium, self.state.outside_medium),
                    **extra,
                )
            )
            return
        if self.state.area_light is not None:
            al = self.state.area_light
            self.lights.append(
                LightSpec(
                    type=LIGHT_AREA,
                    emission_dense=al.emission_dense,
                    scale=al.scale,
                    two_sided=al.two_sided,
                    sphere_index=len(self.spheres), medium=self.state.outside_medium)
            )
            li = len(self.lights) - 1
        self.spheres.append(
            dict(
                center=center,
                radius=radius * s,
                mat=self.state.material_idx,
                light=li,
                rev=self.state.reverse_orientation ^ _swaps_handedness(ctm),
                med=(self.state.inside_medium, self.state.outside_medium),
                **extra,
            )
        )

    def add_disk(self, pd: ParameterDict):
        """reference shapes/disk.cu: z=height plane annulus in object space
        with optional phimax < 360 (partial disks clip on the in-plane
        angle from the object x axis)."""
        phi_max = np.deg2rad(np.clip(pd.get_float("phimax", 360.0), 0.0, 360.0))
        ctm = self.state.ctm
        height = pd.get_float("height", 0.0)
        radius = pd.get_float("radius", 1.0)
        inner = pd.get_float("innerradius", 0.0)
        det = np.linalg.det(ctm[:3, :3])
        sc = abs(det) ** (1.0 / 3.0)
        n = ctm[:3, :3] @ np.array([0.0, 0.0, 1.0])
        n = n / max(np.linalg.norm(n), 1e-12)
        xax = ctm[:3, :3] @ np.array([1.0, 0.0, 0.0])
        xax = xax / max(np.linalg.norm(xax), 1e-12)
        yax = np.cross(n, xax)
        partial = phi_max < 2.0 * np.pi - 1e-6
        if partial and self.state.area_light is not None:
            raise NotImplementedError("partial disks as area lights not supported")
        dkextra = dict(xaxis=xax, yaxis=yax, phimax=float(phi_max), partial=partial)
        center = ctm[:3, 3] + n * height * sc
        rev = self.state.reverse_orientation ^ _swaps_handedness(ctm)
        if rev:
            n = -n
        li = -1
        if self.active_object is not None:
            if self.state.area_light is not None:
                raise ValueError(
                    "area lights inside ObjectBegin/ObjectEnd are not supported"
                )
            self.object_defs[self.active_object]["disks"].append(
                dict(
                    center=center,
                    normal=n,
                    radius=radius * sc,
                    inner=inner * sc,
                    mat=self.state.material_idx,
                    light=-1,
                    med=(self.state.inside_medium, self.state.outside_medium),
                    **dkextra,
                )
            )
            return
        if self.state.area_light is not None:
            al = self.state.area_light
            self.lights.append(
                LightSpec(
                    type=LIGHT_AREA,
                    emission_dense=al.emission_dense,
                    scale=al.scale,
                    two_sided=al.two_sided,
                    disk_index=len(self.disks), medium=self.state.outside_medium)
            )
            li = len(self.lights) - 1
        self.disks.append(
            dict(
                center=center,
                normal=n,
                radius=radius * sc,
                inner=inner * sc,
                mat=self.state.material_idx,
                light=li,
                med=(self.state.inside_medium, self.state.outside_medium),
                **dkextra,
            )
        )

    # ------------------------------------------------------------- parsing

    def parse_file(self, path):
        tokens = lx.tokenize_file(path)
        self._search_dir = os.path.dirname(os.path.abspath(path))
        self.parse_tokens(tokens)
        return self

    def parse_tokens(self, tokens):
        i = 0
        n = len(tokens)
        while i < n:
            tok = tokens[i]
            if tok.kind != lx.KEYWORD:
                raise ValueError(f"expected directive, got {tok}")
            kw = tok.value
            i += 1

            if kw == "WorldBegin":
                self.in_world = True
                self.camera_medium = self.state.outside_medium
                self.state.ctm = tf.identity()
                continue
            if kw == "AttributeBegin":
                self.stack.append(copy.deepcopy(self.state))
                continue
            if kw == "AttributeEnd":
                self.state = self.stack.pop()
                continue
            if kw == "ReverseOrientation":
                self.state.reverse_orientation = not self.state.reverse_orientation
                continue
            if kw == "Identity":
                self.state.ctm = tf.identity()
                continue

            # directives with a leading numeric payload
            if kw == "LookAt":
                vals = [tokens[i + k].value for k in range(9)]
                i += 9
                # CTM := CTM * world-to-camera (reference scene_builder.cu:505-520,
                # transform.h lookat returns camera_from_world as forward matrix)
                self.state.ctm = self.state.ctm @ np.linalg.inv(
                    tf.lookat(vals[0:3], vals[3:6], vals[6:9])
                )
                continue
            if kw == "Translate":
                vals = [tokens[i + k].value for k in range(3)]
                i += 3
                self.state.ctm = self.state.ctm @ tf.translate(*vals)
                continue
            if kw == "Scale":
                vals = [tokens[i + k].value for k in range(3)]
                i += 3
                self.state.ctm = self.state.ctm @ tf.scale(*vals)
                continue
            if kw == "Rotate":
                vals = [tokens[i + k].value for k in range(4)]
                i += 4
                self.state.ctm = self.state.ctm @ tf.rotate(*vals)
                continue
            if kw in ("Transform", "ConcatTransform"):
                assert tokens[i].kind == lx.LBRACKET
                vals = [tokens[i + 1 + k].value for k in range(16)]
                i += 18
                m = np.asarray(vals, dtype=np.float64).reshape(4, 4).T  # column-major input
                if kw == "Transform":
                    self.state.ctm = m
                else:
                    self.state.ctm = self.state.ctm @ m
                continue

            # string-led directives
            if kw == "Include":
                fname = tokens[i].value
                i += 1
                sub = lx.tokenize_file(os.path.join(self._search_dir, fname))
                tokens = tokens[:i] + sub + tokens[i:]
                n = len(tokens)
                continue

            if kw == "Camera":
                ctype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                if ctype != "perspective":
                    raise ValueError(f"camera {ctype!r} not supported")
                self.camera = {
                    "type": ctype,
                    "fov": pd.get_float("fov", 90.0),
                    "lensradius": pd.get_float("lensradius", 0.0),
                    "focaldistance": pd.get_float("focaldistance", 1e6),
                    "camera_from_world": self.state.ctm.copy(),
                }
                continue
            if kw == "Film":
                _ = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                self.film = {
                    "xresolution": pd.get_integer("xresolution", 1920),
                    "yresolution": pd.get_integer("yresolution", 1080),
                    "filename": pd.get_string("filename", "out.png"),
                    # PixelSensor controls (reference film/pixel_sensor.h +
                    # rgb_film.cu:27-37; the reference hardcodes the
                    # defaults — we parse the pbrt-v4 film params)
                    "iso": pd.get_float("iso", 100.0),
                    "whitebalance": pd.get_float("whitebalance", 0.0),
                    "exposuretime": pd.get_float("exposuretime", 1.0),
                }
                continue
            if kw == "Sampler":
                stype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                if stype not in ("independent", "stratified"):
                    raise ValueError(f"sampler {stype!r} not supported")
                self.sampler = {
                    "type": stype,
                    "pixelsamples": pd.get_integer("pixelsamples", 4),
                }
                continue
            if kw == "Integrator":
                itype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                self.integrator = {
                    "type": itype,
                    "maxdepth": pd.get_integer("maxdepth", 5),
                    "mutations": pd.get_integer("mutationsperpixel", 100),
                }
                continue
            if kw == "PixelFilter":
                ftype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                self.filter = {
                    "type": ftype,
                    "xradius": pd.get_float("xradius", None),
                    "yradius": pd.get_float("yradius", None),
                    "sigma": pd.get_float("sigma", 0.5),
                    "B": pd.get_float("B", 1.0 / 3.0),
                    "C": pd.get_float("C", 1.0 / 3.0),
                }
                continue

            if kw == "Material":
                mtype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                self.state.material_idx = self.make_material(mtype, pd)
                continue
            if kw == "MakeNamedMaterial":
                mname = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                mtype = pd.get_string("type")
                self.named_materials[mname] = self.make_material(mtype, pd)
                continue
            if kw == "NamedMaterial":
                mname = tokens[i].value
                i += 1
                self.state.material_idx = self.named_materials[mname]
                continue

            if kw == "AreaLightSource":
                ltype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                if ltype != "diffuse":
                    raise ValueError("only diffuse area lights supported")
                dense, photometric = self.illuminant_dense(pd, "L")
                scale = pd.get_float("scale", 1.0) / photometric
                self.state.area_light = AreaLightSpec(
                    emission_dense=dense,
                    scale=scale,
                    two_sided=pd.get_bool("twosided", False))
                continue

            if kw == "LightSource":
                ltype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                self._add_light_source(ltype, pd)
                continue

            if kw == "Shape":
                stype = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                if stype == "trianglemesh":
                    self.add_triangle_mesh(pd)
                elif stype == "sphere":
                    self.add_sphere(pd)
                elif stype == "disk":
                    self.add_disk(pd)
                elif stype == "plymesh":
                    from pbrt_tpu.scene.ply import read_ply

                    fname = os.path.join(self._search_dir, pd.get_string("filename"))
                    P, idx, N, UV = read_ply(fname)
                    self._emit_mesh(P, idx, N, UV)
                elif stype == "loopsubdiv":
                    from pbrt_tpu.scene.subdivide import loop_subdivide

                    P = pd.get_points3("P")
                    idx = np.asarray(pd.get_integers("indices"), np.int32).reshape(-1, 3)
                    levels = pd.get_integer("levels", 3)
                    P2, idx2, N2 = loop_subdivide(np.asarray(P), idx, levels)
                    self._emit_mesh(P2, idx2, N2, None)
                else:
                    raise ValueError(f"shape {stype!r} not supported yet")
                continue

            if kw == "Texture":
                tname = tokens[i].value
                ttype = tokens[i + 1].value  # "float" | "spectrum"
                tclass = tokens[i + 2].value
                i += 3
                pd, i = parse_parameters(tokens, i)
                if ttype == "float":
                    self.float_textures[tname] = (tclass, pd, self.state.ctm.copy())
                else:
                    self.spectrum_textures[tname] = (tclass, pd, self.state.ctm.copy())
                continue

            if kw == "MakeNamedMedium":
                mname = tokens[i].value
                i += 1
                pd, i = parse_parameters(tokens, i)
                if pd.get_string("type", "homogeneous") != "homogeneous":
                    raise ValueError("only homogeneous media supported (like the reference)")
                self.named_media[mname] = self.make_medium(pd)
                continue
            if kw == "MediumInterface":
                inside = tokens[i].value
                i += 1
                outside = ""
                if i < len(tokens) and tokens[i].kind == "str":
                    outside = tokens[i].value
                    i += 1
                self.state.inside_medium = self.named_media.get(inside, -1)
                self.state.outside_medium = self.named_media.get(outside, -1)
                continue

            if kw == "CoordinateSystem":
                name = tokens[i].value
                i += 1
                self.named_coordinate_systems[name] = self.state.ctm.copy()
                continue
            if kw == "CoordSysTransform":
                name = tokens[i].value
                i += 1
                if name not in self.named_coordinate_systems:
                    raise ValueError(f"coordinate system {name!r} not defined")
                # restores the saved CTM (reference scene_builder.cu:308-317)
                self.state.ctm = self.named_coordinate_systems[name].copy()
                continue
            if kw == "ObjectBegin":
                if self.active_object is not None:
                    raise ValueError("ObjectBegin inside an instance definition")
                name = tokens[i].value
                i += 1
                self.stack.append(copy.deepcopy(self.state))
                self.object_defs[name] = dict(tris=[], spheres=[], disks=[])
                self.active_object = name
                continue
            if kw == "ObjectEnd":
                if self.active_object is None:
                    raise ValueError("ObjectEnd without ObjectBegin")
                self.active_object = None
                self.state = self.stack.pop()
                continue
            if kw == "ObjectInstance":
                name = tokens[i].value
                i += 1
                if self.active_object is not None:
                    raise ValueError("ObjectInstance inside an instance definition")
                self._emit_instance(name)
                continue

            raise ValueError(f"unknown directive {kw!r}")

    def _add_light_source(self, ltype, pd):
        if ltype == "distant":
            dense, photometric = self.illuminant_dense(pd, "L")
            scale = pd.get_float("scale", 1.0) / photometric
            frm = pd.get_point3("from", np.zeros(3))
            to = pd.get_point3("to", np.array([0.0, 0.0, 1.0]))
            ctm = self.state.ctm
            w_from = frm @ ctm[:3, :3].T + ctm[:3, 3]
            w_to = to @ ctm[:3, :3].T + ctm[:3, 3]
            d = w_from - w_to  # direction TOWARDS the light
            self.lights.append(
                LightSpec(
                    type=LIGHT_DISTANT,
                    emission_dense=dense,
                    scale=scale,
                    direction=d / np.linalg.norm(d), medium=self.state.outside_medium)
            )
        elif ltype == "infinite":
            fname = pd.get_string("filename", None)
            dense, photometric = self.illuminant_dense(pd, "L")
            scale = pd.get_float("scale", 1.0) / photometric
            if fname is None:
                self.lights.append(
                    LightSpec(type=LIGHT_UNIFORM_INFINITE, emission_dense=dense, scale=scale, medium=self.state.outside_medium)
                )
            else:
                from pbrt_tpu.textures.image import load_image

                img = load_image(os.path.join(self._search_dir, fname))
                self.lights.append(
                    LightSpec(
                        type=LIGHT_IMAGE_INFINITE,
                        emission_dense=dense,
                        scale=scale,
                        image=img,
                        light_from_render=np.linalg.inv(self.state.ctm),
                        render_from_light=self.state.ctm.copy(), medium=self.state.outside_medium)
                )
        elif ltype == "spot":
            dense, photometric = self.illuminant_dense(pd, "I")
            scale = pd.get_float("scale", 1.0) / photometric
            frm = pd.get_point3("from", np.zeros(3))
            to = pd.get_point3("to", np.array([0.0, 0.0, 1.0]))
            ctm = self.state.ctm
            w_from = frm @ ctm[:3, :3].T + ctm[:3, 3]
            w_to = to @ ctm[:3, :3].T + ctm[:3, 3]
            d = w_to - w_from
            cone = pd.get_float("coneangle", 30.0)
            delta = pd.get_float("conedeltaangle", 5.0)
            # "power" overrides intensity scale: phi = sc * k_e with
            # k_e = 2*pi*((1-cosStart) + (cosStart-cosEnd)/2), the exact
            # cone integral of the smoothstep falloff
            # (reference spot_light.cu:29-34)
            phi_v = pd.get_float("power", -1.0)
            if phi_v > 0:
                cos_end = float(np.cos(np.deg2rad(cone)))
                cos_start = float(np.cos(np.deg2rad(cone - delta)))
                k_e = 2.0 * np.pi * ((1.0 - cos_start)
                                     + (cos_start - cos_end) / 2.0)
                scale *= phi_v / k_e
            self.lights.append(
                LightSpec(
                    type=LIGHT_SPOT,
                    emission_dense=dense,
                    scale=scale,
                    position=w_from,
                    direction=d / np.linalg.norm(d),
                    cos_falloff_start=float(np.cos(np.deg2rad(cone - delta))),
                    cos_falloff_end=float(np.cos(np.deg2rad(cone))), medium=self.state.outside_medium)
            )
        else:
            raise ValueError(f"light {ltype!r} not supported")
