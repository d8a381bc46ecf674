"""Session orchestration: composer + scene manifests."""

from .composer import Composer, ComposerError
from .manifest import (AspectMode, BindCommand, ComposerCommand, Composition,
                       EncodeConfig,
                       Element, ElementState, PicOrigin, PictureAnchor, Scene,
                       SetSceneCommand, SetStateCommand, UnbindCommand,
                       composition_from_json, composition_to_json)

__all__ = [
    "Composer", "ComposerError",
    "Composition", "Scene", "Element", "ElementState", "AspectMode",
    "EncodeConfig",
    "PicOrigin", "PictureAnchor", "ComposerCommand", "SetSceneCommand",
    "SetStateCommand", "BindCommand", "UnbindCommand",
    "composition_to_json", "composition_from_json",
]
