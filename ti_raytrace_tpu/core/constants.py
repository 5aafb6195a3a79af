"""Global constants and enum codes shared by every subsystem.

Schema parity notes (reference: SceneData.py:33-56, UtilsFunc.py:33-43):
  - material / shape / primitive type codes keep the reference's numeric
    values so that host-side fixtures and goldens can be compared 1:1.
  - The reference uses a typo'd pi (3.1415956, UtilsFunc.py:37) in all pdf
    math.  We use the true pi; the bias cancels in every pdf ratio the
    integrators form, and goldens are held to perceptual tolerance
    (documented in PARITY.md).
"""

import numpy as np

# --- math ---------------------------------------------------------------
PI = float(np.pi)
INV_PI = float(1.0 / np.pi)
TWO_PI = float(2.0 * np.pi)
EPS = 1e-5
INF = 1.0e6  # reference INF_VALUE (UtilsFunc.py:38): rays miss at t >= INF

# Physical constants (reference UtilsFunc.py:39-41) for Planck's law.
BOLTZMANN_K = 1.38064852e-23
PLANCK_H = 6.62607015e-34
LIGHT_C = 299792458.0

# --- material type codes (reference SceneData.py:50-53) -----------------
MAT_DISNEY = 0
MAT_GLASS = 1
MAT_LIGHT = 2
MAT_SPECTRAL = 10

# --- analytic shape type codes (reference SceneData.py:40-44) -----------
SHAPE_NONE = 0
SHAPE_SPHERE = 1
SHAPE_QUAD = 2
SHAPE_SPOT = 3
SHAPE_LASER = 4

# --- primitive type codes (reference SceneData.py:46-48) ----------------
PRIM_NONE = 0
PRIM_TRI = 1
PRIM_SHAPE = 2

# --- sRGB <-> XYZ constant matrices (reference UtilsFunc.py:42-43) ------
XYZ_TO_SRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=np.float32,
)
SRGB_TO_XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)

# --- spectral sampling (reference HeroSample.py:5-8) --------------------
LAMBDA_MIN = 360.0
LAMBDA_MAX = 760.0
N_HERO = 4  # correlated hero wavelengths per spectral path
