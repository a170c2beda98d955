"""TestModel — single-generator inference wrapper
(parity target: /root/reference/models/test_model.py)."""

from __future__ import annotations

import jax

from .base_model import BaseModel
from ..nn import factory
from .axial_to_lateral_gan_apollo_model import _to_ndhwc


class TestModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        assert not is_train, "TestModel cannot be used during training time"
        parser.set_defaults(dataset_mode="single")
        parser.add_argument("--model_suffix", type=str, default="",
                            help="In checkpoints_dir, [epoch]_net_G[model_suffix].npz "
                                 "will be loaded as the generator.")
        return parser

    def __init__(self, opt):
        assert not opt.isTrain
        BaseModel.__init__(self, opt)
        self.loss_names = []
        self.visual_names = ["real", "fake"]
        self.model_names = ["G" + opt.model_suffix]
        self.netG = factory.define_G(opt.input_nc, opt.output_nc, opt.ngf, opt.netG,
                                     opt.norm, dimension=self.dimension)
        self.nets[self.model_names[0]] = self.netG
        self.params[self.model_names[0]] = self.netG.init(
            self.next_rng(), opt.init_type, opt.init_gain)
        self._fwd = jax.jit(self.netG.apply)

    def set_input(self, input):
        self.real = _to_ndhwc(input["A"])
        self.image_paths = input.get("A_paths", "")
        self._visuals["real"] = self.real

    def forward(self):
        if getattr(self, "_eval_mode", False):
            # trace under eval semantics: --norm batch nets then use their
            # checkpointed running statistics (torch --eval parity)
            from ..nn.norms import eval_mode

            with eval_mode():
                self.fake = self._fwd(self.params[self.model_names[0]],
                                      self.real)
        else:
            self.fake = self._fwd(self.params[self.model_names[0]], self.real)
        self._visuals["fake"] = self.fake

    def optimize_parameters(self):
        pass
