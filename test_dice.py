"""Tiled ("dice") inference — CLI parity with the reference
/root/reference/test_dice.py, rebuilt around the fused on-device overlap-tile
pipeline (neuroclear_tpu/parallel/dice_infer.py): the volume is uploaded
once, tile batches stream through the jitted generator with on-device
blending, and a single result volume returns to the host.  Pass
--legacy_pipeline for the reference-style per-cube host loop (also used
automatically when --histogram_match needs per-cube host work).

Example (shipped inference config, README.md:149-158):
  python test_dice.py --dataroot <dir> --name <exp> --serial_batches \
    --preprocess addColorChannel --dataset_mode diceImage --netG unet_deconv \
    --overlap 15 --dice_size 120 120 120 --normalize_intensity \
    --image_dimension 3 --model_suffix _A --save_volume --border_cut 10 \
    --skip_real --load_iter <N>
"""

import os
import sys
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
from neuroclear_tpu.data import create_dataset
from neuroclear_tpu.data.image_folder import make_dataset
from neuroclear_tpu.models import create_model
from neuroclear_tpu.options.test_options import TestOptions
from neuroclear_tpu.parallel import metrics as device_metrics
from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline
from neuroclear_tpu.utils import html, imageops, tiffio
from neuroclear_tpu.utils.assemble import Assemble_Dice
from neuroclear_tpu.utils.visualizer import save_images


def main():
    # forward-only surface: the W-pair Pallas conv is safe here (the
    # training-side OOM scope does not apply; see ops/pallas_wconv.py)
    from neuroclear_tpu.ops import pallas_wconv

    pallas_wconv.set_enabled(True)
    parser_extra = "--legacy_pipeline" in sys.argv
    if parser_extra:
        sys.argv.remove("--legacy_pipeline")
    opt = TestOptions().parse()

    # hard-coded test parameters (test_dice.py:64-68)
    opt.num_threads = 0
    opt.batch_size = 1
    opt.serial_batches = True
    opt.no_flip = True
    opt.display_id = -1

    if opt.precision == "float32":
        print("note: --precision float32 requests HIGHEST-precision convs "
              "(torch parity) at ~8x the wall-clock of the default bfloat16 "
              "(bf16/f32 output parity: 69.3 dB PSNR)")

    dataset_class = data.find_dataset_using_name(opt.dataset_mode)
    dataset_probe = dataset_class(opt)
    dataset_size_original = dataset_probe.size_original()
    dataset_size = dataset_probe.size()
    print("original dataset_shape: " + str(dataset_size_original))

    model = create_model(opt)
    model.setup(opt)

    if opt.data_name is None:
        web_dir = os.path.join(opt.results_dir, opt.name,
                               f"{opt.phase}_{opt.epoch}")
    else:
        web_dir = os.path.join(opt.results_dir, opt.data_name + "_by_" + opt.name,
                               f"{opt.phase}_{opt.epoch}")
    if opt.load_iter > 0:
        web_dir = "{:s}_iter{:d}".format(web_dir, opt.load_iter)
    print("creating web directory", web_dir)
    webpage = html.HTML(web_dir, "Experiment = %s, Phase = %s, Epoch = %s"
                        % (opt.name, opt.phase, opt.epoch))

    use_legacy = parser_extra or opt.histogram_match
    t0 = time.time()
    if use_legacy:
        img_whole_dict = run_legacy(opt, model, dataset_probe)
    else:
        img_whole_dict = run_fused(opt, model, dataset_probe, web_dir)
    n_vox = int(np.prod(dataset_size_original))
    dt = time.time() - t0
    print(f"Inference+assembly: {dt:.2f}s "
          f"({n_vox / max(dt, 1e-9) / 1e6:.1f} Mvoxel/s)")
    print("Image volume re-assembled.")
    print("re-merged image shape: {}".format(img_whole_dict["fake"].shape))

    populate_webpages(opt, web_dir, webpage, img_whole_dict)
    save_outputs(opt, web_dir, img_whole_dict)
    compute_gt_metrics(opt, web_dir, img_whole_dict)
    print("----Test done----")


def populate_webpages(opt, web_dir, webpage, img_whole_dict):
    """Fill the two HTML galleries the reference creates (test_dice.py:92,123)
    — a per-slice page and a whole-image page — with PNG thumbnails.  (The
    reference instantiated both pages but never populated or saved them;
    here they render.)"""
    fake = img_whole_dict["fake"]
    real = img_whole_dict.get("real")

    n = fake.shape[0]
    step = max(1, n // 16)  # ~16 sample slices, any volume size
    for i in range(0, n, step):
        visuals = {"output_xy": fake[i]}
        if real is not None and not opt.skip_real:
            visuals["input_xy"] = real[i]
        save_images(webpage, visuals, f"slice_z{i:04d}.tif",
                    aspect_ratio=opt.aspect_ratio)
    webpage.save()

    wholepage = html.HTML(web_dir, "Whole_img: Experiment = %s, Phase = %s, "
                          "Epoch = %s" % (opt.name, opt.phase, opt.epoch))
    mips = {}
    for plane, ax in (("xy", 0), ("xz", 1), ("yz", 2)):
        mips[f"output_{plane}_mip"] = np.amax(fake, axis=ax)
        if real is not None and not opt.skip_real:
            mips[f"input_{plane}_mip"] = np.amax(real, axis=ax)
    save_images(wholepage, mips, "whole_volume.tif", width=384)
    wholepage.save("index_wholeimg.html")


def _volume_out_path(opt, web_dir):
    if opt.load_iter > 0:
        return (web_dir + "/volumes/output_volume_xy-view_iter-"
                + str(opt.load_iter) + ".tif")
    return (web_dir + "/volumes/output_volume_xy-view_epoch-"
            + str(opt.epoch) + ".tif")


def run_fused(opt, model, dataset_probe, web_dir=None):
    """On-device pipeline: tiles -> G -> blend, then host post-processing."""
    from neuroclear_tpu.utils.imageops import pad_for_dicing
    from neuroclear_tpu.ops.augment import dtype_inv_scale

    raw = dataset_probe.cube.image  # border-padded volume
    b = opt.border_cut
    vol_padded = raw[b:-b, b:-b, b:-b] if b > 0 else raw  # dicing-padded only
    inv_scale = dtype_inv_scale(vol_padded.dtype)

    net_name = model.model_names[0]
    g_apply = model.nets[net_name].apply
    params = model.params[net_name]

    # The reference computes the percentile normalisation on the PADDED
    # volume and crops afterwards (assemble_dice.py:190-213), so the device
    # crop is only safe when normalize_intensity is off.
    out_dtype = {"uint8": np.uint8, "uint16": np.uint16}.get(opt.data_type)
    orig = None if opt.normalize_intensity else dataset_probe.size_original()
    pipe = DiceInferencePipeline(
        g_apply, params, dataset_probe.cube.grid, inv_scale,
        tile_batch=opt.tile_batch, repetition=opt.repetition,
        precision=opt.precision, out_dtype=out_dtype, orig_shape=orig)

    # When the emitted rows are already the final bytes (device dtype cast,
    # no whole-volume percentile stretch pending), encode the output TIFF
    # during the harvest: each slab's pages hit the file while later slabs
    # are still in device-to-host flight.  The written file is byte-identical
    # to the post-hoc imwrite (StreamingTiffWriter shares its layout), so
    # save_outputs simply skips the rewrite.
    writer, stream_path = None, None
    if (opt.save_volume and web_dir is not None
            and not opt.normalize_intensity and out_dtype is not None
            and orig is not None
            and tiffio.StreamingTiffWriter.fits(orig, out_dtype)):
        stream_path = _volume_out_path(opt, web_dir)
        writer = tiffio.StreamingTiffWriter(stream_path, orig, out_dtype)
    on_rows = writer.write_rows if writer is not None else None

    if opt.eval:
        # trace the pipeline under eval semantics (--norm batch nets use
        # running stats; a no-op for the stateless instance norm)
        from neuroclear_tpu.nn.norms import eval_mode

        with eval_mode():
            fake = pipe.run_streaming(np.asarray(vol_padded), on_rows=on_rows)
    else:
        fake = pipe.run_streaming(np.asarray(vol_padded), on_rows=on_rows)
    if writer is not None:
        writer.close()

    # 'real' is always assembled (as in the reference, where --skip_real only
    # gates *saving*, test_dice.py:146-157 — the GT metrics at :241-247 read
    # img_whole_dict['real'] unconditionally).
    out = {}
    if stream_path is not None:
        out["fake_streamed"] = stream_path
    real = np.asarray(vol_padded, np.float32) * inv_scale
    out["real"] = _postprocess(real, opt, dataset_probe.size_original())
    out["fake"] = _postprocess(fake, opt, dataset_probe.size_original())
    return out


def _postprocess(vol, opt, orig_shape):
    """normalize_intensity -> dtype cast -> pad crop (Assemble_Dice parity,
    util/assemble_dice.py:190-213).  Accepts [0,1] float or already-cast
    integer volumes (the fast path casts on device to cut transfer 2-4x;
    percentile math then runs on the quantised grid — <=1 LSB deviation)."""
    scale = {"uint8": 255.0, "uint16": 2.0 ** 16 - 1}.get(opt.data_type, 1.0)
    if opt.normalize_intensity:
        vol_f32 = (vol.astype(np.float32) / scale
                   if np.issubdtype(vol.dtype, np.integer) else vol)
        p1, p99 = np.percentile(vol_f32, tuple(opt.sat_level))
        vol = imageops.rescale_intensity(vol_f32, in_range=(p1, p99))
    if not np.issubdtype(vol.dtype, np.integer):
        if opt.data_type == "uint8":
            vol = (vol * 255).astype(np.uint8)
        elif opt.data_type == "uint16":
            vol = (vol * (2 ** 16 - 1)).astype(np.uint16)
    oz, oy, ox = orig_shape
    return vol[:oz, :oy, :ox]


def run_legacy(opt, model, dataset_probe):
    """Reference-style per-cube loop through Assemble_Dice."""
    dataset = create_dataset(opt)
    dice_assembly = Assemble_Dice(opt, dataset=dataset_probe)
    print("whole Image size: {}".format(dice_assembly.image_size))
    print("Whole image step counts y,x,z: {}".format(
        (dice_assembly.y_steps, dice_assembly.x_steps, dice_assembly.z_steps)))

    if opt.eval:
        model.eval()
    for i, data_i in enumerate(dataset):
        model.set_input(data_i)
        if opt.repetition:
            variants = dice_assembly.varycubeinput(
                {"A": np.asarray(model.real), "A_paths": data_i["A_paths"]})
            outs = []
            for v in variants:
                model.set_input(v)
                model.test()
                outs.append({k: np.asarray(x) for k, x in
                             model.get_current_visuals().items()})
            visuals = dice_assembly.combinecube(outs)
        else:
            model.test()
            visuals = model.get_current_visuals()
        dice_assembly.addToStack(visuals)
    print("Inference Done. ")
    dice_assembly.assemble_all()
    return dice_assembly.getDict()


def save_outputs(opt, web_dir, img_whole_dict):
    if not opt.skip_real:
        real_volume = img_whole_dict["real"]
        print("Input data type is: " + str(real_volume.dtype))
    fake_volume = img_whole_dict["fake"]
    print("Output data type is: " + str(fake_volume.dtype))

    if opt.save_volume:
        os.makedirs(web_dir + "/volumes", exist_ok=True)
        out_path = _volume_out_path(opt, web_dir)
        if img_whole_dict.get("fake_streamed") != out_path:
            tiffio.imwrite(out_path, fake_volume)
        print("Output volume is saved as a tiff file. ")
        if not opt.skip_real:
            tiffio.imwrite(web_dir + "/volumes/input_volume_xy-view.tif",
                           real_volume)
            print("Input volume is saved as a tiff file. ")

    if opt.save_projections:
        os.makedirs(web_dir + "/projections", exist_ok=True)
        # the reference hard-codes crop windows [:,800:1100,:] / [:,:,200:500]
        # (test_dice.py:161-162) which crash on smaller volumes; we apply
        # them only when they fit.
        z, y, x = fake_volume.shape
        yz_win = slice(800, 1100) if y >= 1100 else slice(None)
        xz_win = slice(200, 500) if x >= 500 else slice(None)
        tiffio.imwrite(web_dir + f"/projections/fake_xy_proj_epoch-{opt.epoch}.tif",
                       np.amax(fake_volume, axis=0))
        tiffio.imwrite(web_dir + f"/projections/fake_xz_proj_epoch-{opt.epoch}.tif",
                       np.amax(fake_volume[:, yz_win, :], axis=1))
        tiffio.imwrite(web_dir + f"/projections/fake_yz_proj_epoch-{opt.epoch}.tif",
                       np.amax(fake_volume[:, :, xz_win], axis=2))
        if not opt.skip_real:
            real_volume = img_whole_dict["real"]
            tiffio.imwrite(web_dir + "/projections/real_xy_proj.tif",
                           np.amax(real_volume, axis=0))
            tiffio.imwrite(web_dir + "/projections/real_xz_proj.tif",
                           np.amax(real_volume, axis=1))
            tiffio.imwrite(web_dir + "/projections/real_yz_proj.tif",
                           np.amax(real_volume, axis=2))

    if opt.save_slices:
        for plane, ax in (("xy", 0), ("xz", 1), ("yz", 2)):
            os.makedirs(web_dir + f"/images/output_{plane}", exist_ok=True)
            if not opt.skip_real:
                os.makedirs(web_dir + f"/images/input_{plane}", exist_ok=True)
        for i in range(fake_volume.shape[2]):
            tiffio.imwrite(web_dir + f"/images/output_yz/output_yz_{i}.tif",
                           fake_volume[:, :, i])
            if not opt.skip_real:
                tiffio.imwrite(web_dir + f"/images/input_yz/input_yz_{i}.tif",
                               img_whole_dict["real"][:, :, i])
        for i in range(fake_volume.shape[1]):
            tiffio.imwrite(web_dir + f"/images/output_xz/output_xz_{i}.tif",
                           fake_volume[:, i, :])
            if not opt.skip_real:
                tiffio.imwrite(web_dir + f"/images/input_xz/input_xz_{i}.tif",
                               img_whole_dict["real"][:, i, :])
        for i in range(fake_volume.shape[0]):
            tiffio.imwrite(web_dir + f"/images/output_xy/output_xy_{i}.tif",
                           fake_volume[i, :, :])
            if not opt.skip_real:
                tiffio.imwrite(web_dir + f"/images/input_xy/input_xy_{i}.tif",
                               img_whole_dict["real"][i, :, :])


def compute_gt_metrics(opt, web_dir, img_whole_dict):
    if opt.dataroot_gt is None:
        return
    GT_path = make_dataset(opt.dataroot_gt, 1)[0]
    gt_volume = tiffio.imread(GT_path)
    print("Calculating PSNR for the whole image volume...")
    datarange = 2 ** 8 - 1

    fake_volume = img_whole_dict["fake"]
    real_volume = img_whole_dict["real"]

    res = None
    if device_metrics.enabled():
        # slab-streamed on the accelerator (same protocol math; parity test
        # in tests/test_device_metrics.py) -- seconds instead of ~10 min of
        # single-core host float64 on 700^3+ volumes.
        try:
            res = device_metrics.protocol_metrics(real_volume, fake_volume,
                                                  gt_volume)
        except Exception as exc:  # fall back to the host path on any failure
            print(f"device metrics unavailable ({exc}); using host path")
    if res is not None:
        psnr_input_gt = res["psnr_input"]
        psnr_output_gt = res["psnr_output"]
        ssim_input_gt = res["ssim_input"]
        ssim_output_gt = res["ssim_output"]
    else:
        # the reference standardises + normalises to uint8 TWICE
        # (test_dice.py:241-247); replicated for metric parity.
        for _ in range(2):
            real_volume = imageops.normalize(imageops.standardize(real_volume),
                                             data_type=np.uint8)
            fake_volume = imageops.normalize(imageops.standardize(fake_volume),
                                             data_type=np.uint8)
            gt_volume = imageops.normalize(imageops.standardize(gt_volume),
                                           data_type=np.uint8)

        psnr_input_gt = imageops.get_psnr(real_volume, gt_volume, datarange)
        psnr_output_gt = imageops.get_psnr(fake_volume, gt_volume, datarange)
        # SSIM (the reference only scaffolds it, util/visualizer.py:59-83);
        # chunked along z so 700^3+ volumes run in bounded memory.
        ssim_input_gt = imageops.get_ssim(real_volume, gt_volume, datarange)
        ssim_output_gt = imageops.get_ssim(fake_volume, gt_volume, datarange)
    print("Metrics are calculated.")

    message = "Experiment Name: " + opt.name + "\n"
    message += "---------------------------------------------------------\n"
    message += "\nWhole_volume\n"
    message += "---------------------------------------------------------\n"
    message += "Network Input vs. Groundtruth\n"
    message += "(psnr: %.4f) \n" % psnr_input_gt
    if ssim_input_gt is not None:
        message += "(ssim: %.4f) \n" % ssim_input_gt
    message += "---------------------------------------------------------\n"
    message += "Network Output vs. Groundtruth\n"
    message += "(psnr: %.4f) \n" % psnr_output_gt
    if ssim_output_gt is not None:
        message += "(ssim: %.4f) \n" % ssim_output_gt
    message += "---------------------------------------------------------"
    print(message)
    with open(os.path.join(web_dir, "metrics.txt"), "a") as metric_file:
        metric_file.write("%s\n" % message)


if __name__ == "__main__":
    main()
