"""Model registry (reference: models/__init__.py:27-69) — same
import-by-name convention: --model foo_bar -> module
neuroclear_tpu.models.foo_bar_model, class FooBarModel."""

from __future__ import annotations

import importlib

from .base_model import BaseModel


def find_model_using_name(model_name: str):
    model_filename = f"neuroclear_tpu.models.{model_name}_model"
    modellib = importlib.import_module(model_filename)
    target = model_name.replace("_", "") + "model"
    for name, cls in modellib.__dict__.items():
        if name.lower() == target.lower() and issubclass(cls, BaseModel):
            return cls
    raise NotImplementedError(
        f"In {model_filename}.py, there should be a subclass of BaseModel "
        f"with class name that matches {target} in lowercase.")


def get_option_setter(model_name: str):
    return find_model_using_name(model_name).modify_commandline_options


def create_model(opt):
    model = find_model_using_name(opt.model)
    instance = model(opt)
    print(f"model [{type(instance).__name__}] was created")
    return instance
