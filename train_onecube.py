"""Single-volume infinite trainer — CLI parity with the reference
/root/reference/train_onecube.py (flags, cadence, console/TB/checkpoint
artifacts), rebuilt TPU-first:

  * the source volume lives in HBM; each iteration's augmented crop is drawn
    by the fused on-device chain (ops/augment.py) instead of per-iteration
    host cv2 work;
  * the whole CycleGAN iteration is one compiled program (models/*_model.py);
  * the persistent XLA compilation cache makes warm restarts near-instant.

Example (the shipped production config, README.md:122-133):
  python train_onecube.py --dataroot <dir> --dataset_mode singlevolume \
    --preprocess random3Drotate_randomcrop_randomflip_addColorChannel_addBatchChannel \
    --model axial_to_lateral_gan_apollo --netG unet_deconv --netG_B deep_linear_gen \
    --netD basic --gan_mode lsgan --init_type kaiming --norm instance \
    --batch_size 1 --lambda_A 5 --crop_size 108 108 108 --lambda_plane 1 1 1 \
    --save_by_iter --save_latest_freq 500 --lr_policy constant \
    --randomize_projection_depth --projection_depth 10 --display_histogram --add_date
"""

import os
import time

import numpy as np

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

from neuroclear_tpu import data
from neuroclear_tpu.models import create_model
from neuroclear_tpu.options.train_options import TrainOptions
from neuroclear_tpu.parallel.train_parallel import (DataParallel,
                                                    maybe_initialize_distributed)
from neuroclear_tpu.utils.visualizer import Visualizer

if __name__ == "__main__":
    maybe_initialize_distributed()
    # packed-resident conv blocks (ops/packed_block.py) measured 1.60 vs
    # 1.72 s/it (apollo 148^3 +remat bf16, v5e) but OOM beside this
    # trainer's HBM-resident training volume at the production 148^3/700^3
    # operating point — opt in with NEUROCLEAR_PACKED_BLOCK=1 where the
    # footprint allows (smaller crops/volumes); docs/PERFORMANCE.md.
    opt = TrainOptions().parse()

    dataset_class = data.find_dataset_using_name(opt.dataset_mode)
    dataset = dataset_class(opt)

    model = create_model(opt)
    model.setup(opt)
    visualizer = Visualizer(opt)

    device_sampling = (getattr(dataset, "supports_device_sampling", False)
                       and not opt.host_augment)
    if device_sampling:
        print("augmentation: fused on-device chain")
    else:
        print("augmentation: host (cv2) chain")

    # data-parallel scale-out: one crop per device per iteration, gradients
    # all-reduced over ICI (replaces the reference's DataParallel)
    dp = None
    dp_sampler = None
    if len(jax.devices()) > 1 and device_sampling:
        dp = DataParallel(model)
        dp_sampler = dp.batch_sampler(dataset)
        print(f"data parallel over {dp.n} devices (mesh axis 'data')")

    # single-chip execution of the batch-N DP recipe: N crops per optimizer
    # step, gradients averaged before ONE Adam update (models/gan_common.py
    # GanStepConfig.grad_accum).  Mutually exclusive with the mesh DP path —
    # there the batch axis is already sharded over devices.
    accum = max(1, getattr(opt, "grad_accum", 1))
    if accum > 1:
        if dp is not None:
            raise SystemExit("--grad_accum requires a single device; the "
                             "multi-device path batches over the mesh instead")
        if not device_sampling:
            raise SystemExit("--grad_accum needs the fused on-device sampler "
                             "(singlevolume dataset, no --host_augment)")
        print(f"gradient accumulation: {accum} crops per optimizer step")

    iter_data_time = time.time()
    total_iters = 0
    loaded_iter = opt.load_iter + 1 if opt.load_iter > 0 else 0
    total_iters += loaded_iter

    visualizer.reset()
    visualizer.display_model_hyperparameters()
    print("Model hyperparameters documented on tensorboard.")

    if opt.profile_dir:
        jax.profiler.start_trace(opt.profile_dir)

    # failure detection: a wedged device client blocks the loop forever;
    # the watchdog turns that into a clean exit the resume contract handles
    # (idiomatic stand-in for the reference's manual relaunch, SURVEY §5.3).
    # It arms only after the first completed iteration — startup (volume
    # upload, checkpoint load, first compile) can legitimately exceed the
    # window, and a wedge *there* is the caller's timeout to handle.
    heartbeat = [0.0]
    if opt.watchdog_secs > 0:
        import threading

        def _watch():
            while True:
                time.sleep(min(30, opt.watchdog_secs))
                if heartbeat[0] and time.time() - heartbeat[0] > opt.watchdog_secs:
                    print(f"watchdog: no progress for {opt.watchdog_secs}s; "
                          "exiting 42 (resume with --continue_train)",
                          flush=True)
                    os._exit(42)

        threading.Thread(target=_watch, daemon=True).start()

    while True:
        if dp is not None:
            data_i = {"A": dp_sampler(model.next_rng()),
                      "A_paths": dataset.A_path}
        elif accum > 1:
            if getattr(model, "supports_input_sampler", False):
                # host-microbatch accumulation: hand the step a per-crop
                # sampler so the (N, crop^3) batch is never HBM-resident.
                # Default sources gather windows from HOST memory (frees
                # the 686 MB resident volume — the accum-8 HBM margin);
                # NEUROCLEAR_ACCUM_DEVICE_VOL=1 keeps the volume in HBM.
                if os.environ.get("NEUROCLEAR_ACCUM_DEVICE_VOL") == "1":
                    sampler = dataset.per_crop_sampler(model.next_rng(), accum)
                else:
                    sampler = dataset.per_crop_host_window_sampler(
                        model.next_rng(), accum)
                data_i = {"A_sampler": sampler, "A_paths": dataset.A_path}
            else:
                data_i = {"A": dataset.sample_batch(model.next_rng(), accum),
                          "A_paths": dataset.A_path}
        elif device_sampling:
            # NEUROCLEAR_HOST_WINDOW=1: plan the crop on the host and upload
            # only its gather window — frees the 686 MB resident volume for
            # HBM-critical steps (athena 144^3; docs/QUALITY.md round 5)
            if os.environ.get("NEUROCLEAR_HOST_WINDOW") == "1":
                data_i = {"A": dataset.sample_host_window(model.next_rng()),
                          "A_paths": dataset.A_path}
            else:
                data_i = {"A": dataset.sample(model.next_rng()),
                          "A_paths": dataset.A_path}
        else:
            data_i = dataset[np.random.randint(0, 10)]

        iter_start_time = time.time()
        if (total_iters - loaded_iter) % opt.print_freq == 0:
            t_data = iter_start_time - iter_data_time

        total_iters += opt.batch_size
        model.set_input(data_i)
        model.optimize_parameters()

        if total_iters % opt.display_freq == 0:
            model.compute_visuals()
            visualizer.display_current_results(model.get_current_visuals(),
                                               total_iters)

        if total_iters % opt.print_freq == 0:
            print("----------------------------------")
            print("exp name: " + str(opt.name) + ", gpu_id:" + str(opt.gpu_ids))
            print("----------------------------------")
            losses = model.get_current_losses()  # forces device sync
            if opt.nan_check and not all(
                    v == v and abs(v) != float("inf") for v in losses.values()):
                print(f"NaN/Inf loss detected at iter {total_iters}: {losses}")
                model.save_networks("nan_debug")
                raise SystemExit(3)
            t_comp = (time.time() - iter_start_time) / opt.batch_size
            visualizer.print_current_losses(1, total_iters, losses, t_comp, t_data)
            if opt.display_id > 0:
                visualizer.plot_current_losses(total_iters, losses, is_epoch=False)

        if total_iters % opt.save_latest_freq == 0:
            print("----------------------------------")
            print("saving the latest model (iteration %d)" % total_iters)
            save_suffix = "iter_%d" % total_iters if opt.save_by_iter else "latest"
            model.save_networks(save_suffix)
            print("saving the current histogram (iteration %d)" % total_iters)
            visualizer.display_current_histogram(model.get_current_visuals(),
                                                 total_iters)
            print("saving the current visuals (iteration %d)" % total_iters)
            visualizer.save_current_visuals(model.get_current_visuals(), total_iters)
            print("----------------------------------")

        model.update_learning_rate()
        iter_data_time = time.time()
        heartbeat[0] = time.time()

        if opt.max_iters and total_iters - loaded_iter >= opt.max_iters:
            print(f"reached --max_iters {opt.max_iters}; saving and exiting")
            model.save_networks("iter_%d" % total_iters if opt.save_by_iter
                                else "latest")
            break

    if opt.profile_dir:
        jax.profiler.stop_trace()
