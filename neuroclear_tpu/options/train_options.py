"""Training options (parity: /root/reference/options/train_options.py)."""

from __future__ import annotations

from .base_options import BaseOptions


class TrainOptions(BaseOptions):
    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        # display parameters
        parser.add_argument("--display_freq", type=int, default=100,
                            help="iterations between tensorboard figure refreshes")
        parser.add_argument("--display_ncols", type=int, default=4,
                            help="columns in the consolidated web image panel (when positive)")
        parser.add_argument("--display_id", type=int, default=1,
                            help="display window id; <= 0 disables the loss plots")
        parser.add_argument("--display_server", type=str, default="http://localhost",
                            help="visdom host (kept for CLI parity; unused by the TB sink)")
        parser.add_argument("--display_env", type=str, default="main",
                            help="visdom environment (kept for CLI parity)")
        parser.add_argument("--display_port", type=int, default=8097,
                            help="visdom port (kept for CLI parity)")
        parser.add_argument("--update_html_freq", type=int, default=1000,
                            help="iterations between HTML snapshot refreshes")
        parser.add_argument("--print_freq", type=int, default=500,
                            help="iterations between console loss lines (also the device sync point)")
        parser.add_argument("--no_html", action="store_true",
                            help="skip writing intermediate visual snapshots")
        # network saving and loading parameters
        parser.add_argument("--save_latest_freq", type=int, default=500,
                            help="iterations between checkpoint writes")
        parser.add_argument("--save_epoch_freq", type=int, default=10,
                            help="epochs between end-of-epoch checkpoint writes (train.py)")
        parser.add_argument("--save_by_iter", action="store_true",
                            help="name periodic checkpoints iter_<N> instead of overwriting 'latest'")
        parser.add_argument("--continue_train", action="store_true",
                            help="resume from an existing checkpoint (with --epoch/--load_iter)")
        parser.add_argument("--epoch_count", type=int, default=1,
                            help="epoch number to resume counting from")
        parser.add_argument("--phase", type=str, default="train",
                            help="run phase label (train/val/test); selects the *_opt.txt filename")
        # training parameters
        parser.add_argument("--n_epochs", type=int, default=50000000,
                            help="epochs at the initial learning rate before decay starts")
        parser.add_argument("--n_epochs_decay", type=int, default=100,
                            help="epochs over which the linear policy anneals the rate to zero")
        parser.add_argument("--beta1", type=float, default=0.1,
                            help="Adam beta1 (the reference trains GANs at 0.1)")
        parser.add_argument("--lr", type=float, default=0.0001,
                            help="Adam step size")
        parser.add_argument("--momentum", type=float, default=0.9,
                            help="SGD momentum (only for optimizers that use it)")
        parser.add_argument("--lr_policy", type=str, default="linear",
                            help="rate schedule [linear | constant | step | plateau | cosine]")
        parser.add_argument("--lr_decay_iters", type=int, default=50,
                            help="period (in epochs) of the step policy's 0.1x decay")
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
        parser.add_argument("--grad_accum", type=int, default=1,
                            help="accumulate gradients over N crops per optimizer "
                                 "step (sequential on one chip; exact math of the "
                                 "N-device data-parallel step, so a 1-chip run "
                                 "certifies the N-chip batch recipe)")
        parser.add_argument("--fused_accum", action="store_true",
                            help="run --grad_accum as ONE fused lax.scan program "
                                 "instead of the default per-microbatch dispatch "
                                 "loop (needs the whole batch resident in HBM)")
        parser.add_argument("--watchdog_secs", type=int, default=0,
                            help="exit with code 42 if no training progress for this "
                                 "many seconds (a hung device client can otherwise "
                                 "block forever); pair with an auto-resume wrapper "
                                 "(--continue_train --load_iter)")
        self.isTrain = True
        return parser
