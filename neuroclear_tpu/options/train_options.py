"""Training options (parity: /root/reference/options/train_options.py)."""

from __future__ import annotations

from .base_options import BaseOptions


class TrainOptions(BaseOptions):
    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        # display parameters
        parser.add_argument("--display_freq", type=int, default=100,
                            help="frequency of showing training results on screen")
        parser.add_argument("--display_ncols", type=int, default=4,
                            help="if positive, display all images in a single web panel")
        parser.add_argument("--display_id", type=int, default=1,
                            help="window id of the web display")
        parser.add_argument("--display_server", type=str, default="http://localhost",
                            help="visdom server of the web display")
        parser.add_argument("--display_env", type=str, default="main",
                            help="visdom display environment name")
        parser.add_argument("--display_port", type=int, default=8097,
                            help="visdom port of the web display")
        parser.add_argument("--update_html_freq", type=int, default=1000,
                            help="frequency of saving training results to html")
        parser.add_argument("--print_freq", type=int, default=500,
                            help="frequency of showing training results on console")
        parser.add_argument("--no_html", action="store_true",
                            help="do not save intermediate training results")
        # network saving and loading parameters
        parser.add_argument("--save_latest_freq", type=int, default=500,
                            help="frequency of saving the latest results")
        parser.add_argument("--save_epoch_freq", type=int, default=10,
                            help="frequency of saving checkpoints at the end of epochs")
        parser.add_argument("--save_by_iter", action="store_true",
                            help="whether saves model by iteration")
        parser.add_argument("--continue_train", action="store_true",
                            help="continue training: load the latest model")
        parser.add_argument("--epoch_count", type=int, default=1,
                            help="the starting epoch count")
        parser.add_argument("--phase", type=str, default="train",
                            help="train, val, test, etc")
        # training parameters
        parser.add_argument("--n_epochs", type=int, default=50000000,
                            help="number of epochs with the initial learning rate")
        parser.add_argument("--n_epochs_decay", type=int, default=100,
                            help="number of epochs to linearly decay learning rate to zero")
        parser.add_argument("--beta1", type=float, default=0.1,
                            help="momentum term of adam")
        parser.add_argument("--lr", type=float, default=0.0001,
                            help="initial learning rate for adam")
        parser.add_argument("--momentum", type=float, default=0.9,
                            help="momentum term for SGD.")
        parser.add_argument("--lr_policy", type=str, default="linear",
                            help="learning rate policy. [linear | step | plateau | cosine]")
        parser.add_argument("--lr_decay_iters", type=int, default=50,
                            help="multiply by a gamma every lr_decay_iters iterations")
        # TPU-native extensions
        parser.add_argument("--max_iters", type=int, default=0,
                            help="stop train_onecube after this many iterations (0 = infinite)")
        parser.add_argument("--nan_check", action="store_true",
                            help="abort (after saving a debug checkpoint) if any loss "
                                 "goes non-finite; checked at --print_freq cadence")
        parser.add_argument("--remat", action="store_true",
                            help="rematerialize generator activations in the G step "
                                 "(fit larger crops, e.g. athena at 148^3, at ~30%% "
                                 "extra generator FLOPs)")
        parser.add_argument("--watchdog_secs", type=int, default=0,
                            help="exit with code 42 if no training progress for this "
                                 "many seconds (a hung device client can otherwise "
                                 "block forever); pair with an auto-resume wrapper "
                                 "(--continue_train --load_iter)")
        self.isTrain = True
        return parser
