"""CLI options — flag-compatible with the reference
(/root/reference/options/base_options.py), including the two-pass parse with
dynamic flag injection from the chosen model and dataset classes
(base_options.py:75-101).  Flag names and defaults are the parity contract;
descriptions are this framework's own."""

from __future__ import annotations

import argparse
import datetime
import os


class BaseOptions:
    def __init__(self):
        self.initialized = False
        self.time = datetime.datetime.now().strftime("%Y%m%d-%H%M")

    def initialize(self, parser):
        # basic parameters
        parser.add_argument("--dataroot",
                            help="directory containing the input TIFF volume(s)")
        parser.add_argument("--name", type=str, default="experiment_name",
                            help="experiment tag; checkpoints and results are "
                                 "filed under this name")
        parser.add_argument("--gpu_ids", type=str, default="0",
                            help="device ids (kept for CLI parity; device placement is "
                                 "managed by JAX). use -1 for CPU")
        parser.add_argument("--checkpoints_dir", type=str, default="./checkpoints",
                            help="root directory for model checkpoints")
        parser.add_argument("--add_date", action="store_true",
                            help="prefix the experiment name with a YYYYmmdd-HHMM stamp")
        parser.add_argument("--image_dimension", default=3, type=int,
                            help="spatial rank of the data (3 for volumes, 2 for images)")
        parser.add_argument("--server", type=str, default="not-specified",
                            help="free-form label recording which machine ran this")
        # model parameters
        parser.add_argument("--model", type=str, default="cycle_gan",
                            help="model class to train/evaluate "
                                 "[axial_to_lateral_gan_apollo | "
                                 "axial_to_lateral_gan_athena | "
                                 "axial_to_lateral_gan_dryops | test]")
        parser.add_argument("--input_nc", type=int, default=1,
                            help="channels in the network input (1 for the "
                                 "grayscale microscopy volumes)")
        parser.add_argument("--output_nc", type=int, default=1,
                            help="channels in the network output")
        parser.add_argument("--ngf", type=int, default=64,
                            help="base channel width of the generator")
        parser.add_argument("--ndf", type=int, default=64,
                            help="base channel width of the discriminator")
        parser.add_argument("--netD", type=str, default="basic",
                            help="discriminator variant [basic | basic_SN | n_layers | "
                                 "n_layers_SN | pixel | kernelGAN]")
        parser.add_argument("--netG", type=str, default="unet_deconv",
                            help="generator variant (see nn/factory.py for the "
                                 "12 registered names)")
        parser.add_argument("--n_layers_D", type=int, default=3,
                            help="conv depth when netD is the n_layers PatchGAN")
        parser.add_argument("--norm", type=str, default="instance",
                            help="normalisation layer in the networks "
                                 "[instance | batch | spectral | none]")
        parser.add_argument("--init_type", type=str, default="normal",
                            help="weight init scheme [normal | xavier | kaiming | orthogonal]")
        parser.add_argument("--init_gain", type=float, default=0.02,
                            help="gain/std used by the normal, xavier and orthogonal inits")
        parser.add_argument("--no_dropout", action="store_true",
                            help="build the generator without dropout")
        # dataset parameters
        parser.add_argument("--dataset_mode", type=str, default="braincube",
                            help="dataset class to read volumes with [singlevolume | "
                                 "cube | diceImage | simulationcrop]")
        parser.add_argument("--direction", type=str, default="AtoB",
                            help="mapping direction, AtoB or BtoA")
        parser.add_argument("--serial_batches", action="store_true",
                            help="iterate the dataset in file order instead of shuffling")
        parser.add_argument("--num_threads", default=8, type=int,
                            help="host worker threads for the data loader")
        parser.add_argument("--no_pin_memory", action="store_true",
                            help="disable pinned staging buffers in the loader")
        parser.add_argument("--batch_size", type=int, default=1,
                            help="samples per training step")
        parser.add_argument("--load_size", type=int, default=286,
                            help="resize target applied before cropping (when the "
                                 "preprocess chain asks for it)")
        parser.add_argument("--crop_size", type=int, nargs="+", default=[0, 0, 0],
                            help="training crop extent per axis (z y x); 0 keeps "
                                 "the full axis")
        parser.add_argument("--dice_size", type=int, nargs="+", default=[0, 0, 0],
                            help="tile extent per axis (z y x) for tiled inference")
        parser.add_argument("--max_dataset_size", type=int, default=float("inf"),
                            help="cap on the number of samples drawn from the dataset")
        parser.add_argument("--preprocess", type=str, default="none",
                            help="underscore-joined augmentation chain, e.g. "
                                 "random3Drotate_randomcrop_randomflip_"
                                 "addColorChannel_addBatchChannel")
        parser.add_argument("--display_winsize", type=int, default=256,
                            help="pixel size of images in the HTML/TB displays")
        parser.add_argument("--display_histogram", action="store_true",
                            help="log intensity histograms of the visuals to tensorboard")
        # additional parameters
        parser.add_argument("--epoch", type=str, default="latest",
                            help="checkpoint suffix to load ('latest' or an epoch number)")
        parser.add_argument("--load_iter", type=int, default=0,
                            help="when > 0, load the iter_<N> checkpoint instead of "
                                 "the one named by --epoch; study runs record the "
                                 "best N (argmax protocol PSNR) in their log dir's "
                                 "selected.txt (scripts/select_checkpoint.py)")
        parser.add_argument("--verbose", action="store_true",
                            help="print network architectures and extra diagnostics")
        parser.add_argument("--suffix", default="", type=str,
                            help="template appended to the name, formatted from the "
                                 "parsed options (e.g. '{netG}_{crop_size}')")
        parser.add_argument("--debug", action="store_true",
                            help="start a jax.profiler server for remote debugging "
                                 "(replaces the reference's pydevd hook)")
        # TPU-native extensions
        parser.add_argument("--seed", type=int, default=None,
                            help="PRNG seed (random if omitted)")
        parser.add_argument("--host_augment", action="store_true",
                            help="force the host (cv2) augmentation chain instead of the "
                                 "fused on-device chain")
        parser.add_argument("--precision", type=str, default="float32",
                            choices=["float32", "bfloat16"],
                            help="compute precision for conv layers")
        parser.add_argument("--profile_dir", type=str, default=None,
                            help="write a jax profiler trace of the hot loop here")
        self.initialized = True
        return parser

    def gather_options(self, args=None):
        from .. import data, models

        if not self.initialized:
            parser = argparse.ArgumentParser(
                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
            parser = self.initialize(parser)

        opt, _ = parser.parse_known_args(args)

        model_option_setter = models.get_option_setter(opt.model)
        parser = model_option_setter(parser, self.isTrain)
        opt, _ = parser.parse_known_args(args)

        dataset_option_setter = data.get_option_setter(opt.dataset_mode)
        parser = dataset_option_setter(parser, self.isTrain)

        self.parser = parser
        return parser.parse_args(args)

    def print_options(self, opt):
        message = ""
        message += "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = "\t[default: %s]" % str(default)
            message += "{:>25}: {:<30}{}\n".format(str(k), str(v), comment)
        message += "----------------- End -------------------"
        print(message)

        if self.isTrain:
            expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        else:
            if getattr(opt, "data_name", None) is not None:
                expr_dir = os.path.join(opt.results_dir, opt.data_name + "_by_" + opt.name)
            else:
                expr_dir = os.path.join(opt.results_dir, opt.name)
        os.makedirs(expr_dir, exist_ok=True)
        file_name = os.path.join(expr_dir, f"{opt.phase}_opt.txt")
        with open(file_name, "wt") as opt_file:
            opt_file.write(message)
            opt_file.write("\n")

    def parse(self, args=None):
        opt = self.gather_options(args)
        opt.isTrain = self.isTrain

        if opt.add_date and (not opt.continue_train if self.isTrain else True):
            opt.name = self.time + "_" + opt.name
        if opt.suffix:
            suffix = ("_" + opt.suffix.format(**vars(opt))) if opt.suffix != "" else ""
            opt.name = opt.name + suffix

        self.print_options(opt)

        # gpu_ids kept for parity; JAX owns device placement
        str_ids = opt.gpu_ids.split(",")
        opt.gpu_ids = [int(s) for s in str_ids if int(s) >= 0]

        if opt.debug:
            import jax

            port = 9999
            jax.profiler.start_server(port)
            print(f"jax profiler server listening on :{port}")

        self.opt = opt
        return self.opt
