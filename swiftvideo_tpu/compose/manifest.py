"""Scene-graph manifests — re-exported from swiftvideo_tpu.scene (kept as a
standalone module to avoid package-init import cycles with mix.animator)."""

from ..scene import *  # noqa: F401,F403
from ..scene import (AspectMode, BindCommand, ComposerCommand, Composition,
                     EncodeConfig,
                     Element, ElementState, PicOrigin, PictureAnchor, Scene,
                     SetSceneCommand, SetStateCommand, UnbindCommand,
                     composition_from_json, composition_to_json)
