#!/usr/bin/env python3
"""Extract public spectral datasets from the reference headers into .npz files.

The arrays extracted here are *data*, not code: the CIE 1931 color matching
functions / D-illuminant basis (public standard data), and metal/glass
refractive index measurements from refractiveindex.info (CC0 public domain,
see reference spectrum_constants_glass.h:5-6).

Sources (reference, for parity auditing):
  src/pbrt/spectrum_util/spectrum_constants_cie.h   (CIE_X/Y/Z/LAMBDA, D6500, S0/S1/S2)
  src/pbrt/spectrum_util/spectrum_constants_metal.h (Ag/Al/Au/Cu eta,k interleaved)
  src/pbrt/spectrum_util/spectrum_constants_glass.h (BK7/SF11 eta interleaved)

Run once: python tools/extract_spectral_data.py
Outputs:  pbrt_tpu/data/{cie,metal,glass}.npz
"""
import re
import numpy as np
import pathlib

REF = pathlib.Path("/root/reference/src/pbrt/spectrum_util")
OUT = pathlib.Path(__file__).resolve().parent.parent / "pbrt_tpu" / "data"
OUT.mkdir(parents=True, exist_ok=True)

ARRAY_RE = re.compile(
    r"(?:constexpr\s+Real|const\s+Real|const\s+std::vector<Real>)\s+"
    r"(\w+)\s*(?:\[[^\]]*\])?\s*=\s*\{([^}]*)\}",
    re.S,
)


def parse_arrays(path):
    text = path.read_text()
    out = {}
    for name, body in ARRAY_RE.findall(text):
        vals = [float(tok) for tok in re.split(r"[,\s]+", body.strip()) if tok]
        out[name] = np.asarray(vals, dtype=np.float64)
    return out


def main():
    cie = parse_arrays(REF / "spectrum_constants_cie.h")
    np.savez_compressed(
        OUT / "cie.npz",
        lambda_=cie["CIE_LAMBDA_CPU"],
        x=cie["CIE_X_VALUE_CPU"],
        y=cie["CIE_Y_VALUE_CPU"],
        z=cie["CIE_Z_VALUE_CPU"],
        illum_d6500_interleaved=cie["CIE_Illum_D6500"],
        s_lambda=cie["CIE_S_lambda"],
        s0=cie["CIE_S0"],
        s1=cie["CIE_S1"],
        s2=cie["CIE_S2"],
    )
    metal = parse_arrays(REF / "spectrum_constants_metal.h")
    np.savez_compressed(OUT / "metal.npz", **{k: v for k, v in metal.items()})
    glass = parse_arrays(REF / "spectrum_constants_glass.h")
    np.savez_compressed(OUT / "glass.npz", **{k: v for k, v in glass.items()})
    for f in ["cie.npz", "metal.npz", "glass.npz"]:
        d = np.load(OUT / f)
        print(f, {k: d[k].shape for k in d.files})


if __name__ == "__main__":
    main()
