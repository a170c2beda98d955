"""Epoch trainer — CLI parity with the reference /root/reference/train.py
(classic pix2pix epoch loop over the batched dataset loader)."""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

# honour JAX_PLATFORMS even on hosts whose sitecustomize re-forces a TPU
# plugin after env-var selection
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from neuroclear_tpu.data import create_dataset
from neuroclear_tpu.models import create_model
from neuroclear_tpu.options.train_options import TrainOptions
from neuroclear_tpu.parallel.train_parallel import (DataParallel,
                                                    maybe_initialize_distributed)
from neuroclear_tpu.utils.visualizer import Visualizer

if __name__ == "__main__":
    maybe_initialize_distributed()
    # packed-resident conv blocks are opt-in (NEUROCLEAR_PACKED_BLOCK=1);
    # see train_onecube.py for the measured scope
    opt = TrainOptions().parse()
    if getattr(opt, "grad_accum", 1) > 1:
        raise SystemExit("--grad_accum is a train_onecube.py feature (it needs "
                         "the fused on-device sampler); the epoch trainer "
                         "batches via --batch_size / the device mesh instead")

    dataset = create_dataset(opt)
    dataset_size = len(dataset)
    print("The number of training images = %d" % dataset_size)

    model = create_model(opt)
    model.setup(opt)
    visualizer = Visualizer(opt)
    total_iters = 0

    # data-parallel scale-out for the epoch trainer: the loader's real batch
    # axis is sharded over the mesh (params replicated, gradient all-reduce
    # over ICI falls out of the partitioner)
    dp = None
    if len(jax.devices()) > 1 and opt.batch_size % len(jax.devices()) == 0:
        dp = DataParallel(model)
        print(f"data parallel over {dp.n} devices (mesh axis 'data')")

    for epoch in range(opt.epoch_count, opt.n_epochs + opt.n_epochs_decay + 1):
        epoch_start_time = time.time()
        iter_data_time = time.time()
        epoch_iter = 0
        visualizer.reset()

        for i, data_i in enumerate(dataset):
            iter_start_time = time.time()
            if total_iters % opt.print_freq == 0:
                t_data = iter_start_time - iter_data_time

            total_iters += opt.batch_size
            epoch_iter += opt.batch_size
            if dp is not None:
                data_i = dict(data_i, A=dp.shard(data_i["A"]))
            model.set_input(data_i)
            model.optimize_parameters()

            if total_iters % opt.display_freq == 0:
                model.compute_visuals()
                visualizer.display_current_results(model.get_current_visuals(),
                                                   total_iters)

            if total_iters % opt.print_freq == 0:
                losses = model.get_current_losses()
                t_comp = (time.time() - iter_start_time) / opt.batch_size
                visualizer.print_current_losses(
                    epoch, int(100.0 * epoch_iter / max(dataset_size, 1)),
                    losses, t_comp, t_data)
                if opt.display_id > 0:
                    visualizer.plot_current_losses(total_iters, losses,
                                                   is_epoch=False)

            if total_iters % opt.save_latest_freq == 0:
                print("saving the latest model (epoch %d, total_iters %d)"
                      % (epoch, total_iters))
                save_suffix = ("iter_%d" % total_iters if opt.save_by_iter
                               else "latest")
                model.save_networks(save_suffix)

            iter_data_time = time.time()

        if epoch % opt.save_epoch_freq == 0:
            print("saving the model at the end of epoch %d, iters %d"
                  % (epoch, total_iters))
            visualizer.display_current_histogram(model.get_current_visuals(), epoch)
            losses = model.get_current_losses()
            visualizer.plot_current_losses(epoch, losses, is_epoch=True)
            model.save_networks("latest")
            model.save_networks(epoch)

        print("End of epoch %d / %d \t Time Taken: %d sec"
              % (epoch, opt.n_epochs + opt.n_epochs_decay,
                 time.time() - epoch_start_time))
        model.update_learning_rate()
