"""Test options (parity: /root/reference/options/test_options.py)."""

from __future__ import annotations

from .base_options import BaseOptions


class TestOptions(BaseOptions):
    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--dataroot_gt",
                            help="directory with the ground-truth volume for PSNR/SSIM")
        parser.add_argument("--ntest", type=int, default=float("inf"),
                            help="cap on test items iterated (kept for CLI parity)")
        parser.add_argument("--results_dir", type=str, default="./results/",
                            help="root directory for inference outputs")
        parser.add_argument("--aspect_ratio", type=float, default=1.0,
                            help="aspect ratio applied to saved result images")
        parser.add_argument("--phase", type=str, default="test",
                            help="run phase label; selects the *_opt.txt filename")
        parser.add_argument("--eval", action="store_true",
                            help="run the networks in eval mode (batch-norm uses running stats)")
        parser.add_argument("--num_test", type=int, default=3000,
                            help="number of test items to process (kept for CLI parity)")
        parser.add_argument("--data_name", type=str, default=None,
                            help="dataset label used to compose the results folder name")
        parser.add_argument("--data_type", type=str, default="uint16",
                            help="output volume dtype: uint16 or uint8")
        parser.add_argument("--histogram_match", action="store_true", default=False,
                            help="match each output tile's histogram to its input tile (forces the per-cube host pipeline)")
        parser.add_argument("--normalize_intensity", action="store_true", default=False,
                            help="percentile-rescale the assembled volume (see --sat_level)")
        parser.add_argument("--sat_level", type=float, nargs="+", default=[0.25, 99.75],
                            help="low/high percentile saturations for --normalize_intensity")
        parser.add_argument("--background_threshold", type=float, nargs="+",
                            default=[None, None],
                            help="background threshold pair (parsed for parity; the reference never wires it either, test_dice.py:229)")
        parser.add_argument("--reference_slice_range", type=int, nargs="+",
                            default=[None, None],
                            help="slice range for metrics (parsed for parity; unwired, as in the reference)")
        parser.add_argument("--save_slices", action="store_true",
                            help="write every 2D slice of the result as TIFF")
        parser.add_argument("--save_volume", action="store_true",
                            help="write the assembled 3D volume as TIFF")
        parser.add_argument("--save_projections", action="store_true",
                            help="write max-intensity projections of the result")
        parser.add_argument("--compare_with_gt", action="store_true",
                            help="parsed for parity; metrics are gated on --dataroot_gt (as in the reference, test_dice.py:229)")
        parser.add_argument("--repetition", action="store_true",
                            help="flip-TTA: infer flipped copies of each tile and average")
        parser.add_argument("--skip_real", action="store_true",
                            help="do not save the input volume/slices (metrics still use them)")
        # TPU-native extension: tile batch size for the device pipeline
        parser.add_argument("--tile_batch", type=int, default=2,
                            help="number of dice tiles per device batch during inference")
        parser.set_defaults(model="test")
        parser.set_defaults(load_size=parser.get_default("crop_size"))
        # Inference defaults to bf16: output parity with f32 measured at
        # 69.3 dB PSNR (docs/PERFORMANCE.md) at ~8x less wall-clock —
        # f32 requests Precision.HIGHEST (torch-parity multi-pass MXU).
        parser.set_defaults(precision="bfloat16")
        self.isTrain = False
        return parser
