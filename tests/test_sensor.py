"""PixelSensor (reference film/pixel_sensor.h + rgb_film.cu:27-48):
imaging ratio (exposure * iso / 100) and white-balance adaptation."""
import numpy as np

from pbrt_tpu.scene import builder as bd, lexer as lx
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators.render import render

SCENE = """
Integrator "path" "integer maxdepth" [2]
Sampler "independent" "integer pixelsamples" [4]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8] {params}
PixelFilter "box"
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "diffuse" "rgb reflectance" [0.7 0.7 0.7]
Shape "sphere" "float radius" [1]
"""


def _render(params=""):
    b = bd.SceneBuilder()
    b.parse_tokens(lx.tokenize(SCENE.format(params=params)))
    scene, meta = compile_scene(b)
    return np.asarray(render(scene, meta)), meta


def test_iso_scales_linearly():
    img100, m100 = _render()
    img400, m400 = _render('"float iso" [400]')
    assert m100.film_imaging_ratio == 1.0
    assert m400.film_imaging_ratio == 4.0
    np.testing.assert_allclose(img400, 4.0 * img100, rtol=1e-5)


def test_whitebalance_shifts_tint():
    img_d65, _ = _render()
    img_warm, meta = _render('"float whitebalance" [3000]')
    from pbrt_tpu.spectral import colorspace as cs

    assert not np.allclose(
        np.asarray(meta.film_out_matrix), np.asarray(cs.srgb().rgb_from_xyz), atol=1e-4
    )
    # adapting FROM a 3000K (reddish) source white pushes the render blue:
    # red/blue ratio must drop vs the unbalanced render
    r65, b65 = img_d65[..., 0].mean(), img_d65[..., 2].mean()
    rw, bw = img_warm[..., 0].mean(), img_warm[..., 2].mean()
    assert rw / max(bw, 1e-6) < r65 / max(b65, 1e-6)
    # and the image stays finite/positive overall
    assert np.isfinite(img_warm).all()
    assert img_warm.mean() > 0
