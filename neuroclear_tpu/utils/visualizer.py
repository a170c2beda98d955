"""Training observability — console / loss_log.txt / TensorBoard / TIFF
snapshots (parity target: /root/reference/util/visualizer.py).

Keeps all four sinks of the reference: formatted console loss lines,
loss_log.txt, TB scalars + slice/MIP figures + histograms + hyperparameter
markdown, and per-epoch TIFF visual snapshots.  Device arrays are fetched
only at display_freq boundaries, keeping the hot loop async.
"""

from __future__ import annotations

import os
import time

import numpy as np

from . import tiffio
from .imageops import tensor2im


def _to_b1zyx(image) -> np.ndarray:
    """Visuals are NDHWC; the reference plotted NCDHW[0,0]."""
    img = np.asarray(image)
    if img.ndim == 5:  # (N, Z, Y, X, C)
        return img[0, ..., 0]
    if img.ndim == 4:
        return img[0] if img.shape[-1] != 1 else img[..., 0]
    return img


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.name = opt.name
        self.display_histogram = getattr(opt, "display_histogram", False)
        self.use_html = opt.isTrain and not getattr(opt, "no_html", False)
        self.saved = False

        if self.use_html:
            self.web_dir = os.path.join(opt.checkpoints_dir, opt.name, "web")
            self.img_dir = os.path.join(self.web_dir, "images")
            print(f"create web directory {self.web_dir}...")
            os.makedirs(self.img_dir, exist_ok=True)

        self.tb_dir = os.path.join(opt.checkpoints_dir, "tensorboard")
        print(f"create tensorboard directory {self.tb_dir}...")
        os.makedirs(self.tb_dir, exist_ok=True)
        self.log_dir = os.path.join(self.tb_dir, self.name)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb_writer = SummaryWriter(self.log_dir)
        except Exception as e:  # pragma: no cover - tensorboard always present
            print(f"tensorboard unavailable ({e}); TB logging disabled")
            self.tb_writer = None

        self.log_name = os.path.join(opt.checkpoints_dir, opt.name, "loss_log.txt")
        os.makedirs(os.path.dirname(self.log_name), exist_ok=True)
        with open(self.log_name, "a") as log_file:
            now = time.strftime("%c")
            log_file.write(f"================ Training Loss ({now}) ================\n")

    def reset(self):
        self.saved = False

    def display_current_results(self, visuals, epoch):
        if self.tb_writer is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if getattr(self.opt, "model", "") == "classifier":
            self._display_classifier_results(visuals, epoch, plt)
            return
        for label, image in visuals.items():
            vol = tensor2im(_to_b1zyx(image), imtype=np.uint8)
            mid = vol.shape[0] // 2
            fig_slice, axes = plt.subplots(1, 3, dpi=150)
            for ax, (img, title) in zip(axes, [
                    (vol[mid, :, :], "XY slice"),
                    (vol[:, mid, :], "XZ slice"),
                    (vol[:, :, mid], "YZ slice")]):
                ax.set_axis_off()
                ax.set_title(title)
                ax.imshow(img, cmap="gray")
            plt.close(fig_slice)

            fig_mip, axes = plt.subplots(1, 3, dpi=150)
            for ax, (img, title) in zip(axes, [
                    (np.amax(vol, 0), "XY MIP"),
                    (np.amax(vol, 1), "XZ MIP"),
                    (np.amax(vol, 2), "YZ MIP")]):
                ax.set_axis_off()
                ax.set_title(title)
                ax.imshow(img, vmax=256, cmap="gray")
            plt.close(fig_mip)

            self.tb_writer.add_figure("train_slice_images/" + label, fig_slice, epoch)
            self.tb_writer.add_figure("train_mip_images/" + label, fig_mip, epoch)

    def _display_classifier_results(self, visuals, epoch, plt):
        """Classifier display branch (util/visualizer.py:203-231): softmax /
        GT-label visuals render as an Axial/Lateral text card; everything
        else as a grayscale slice.  Used by the --netG VGG axial-vs-lateral
        classification experiments."""
        for label, image in visuals.items():
            arr = np.asarray(image)
            if label in ("output_tr_softmax", "output_val_softmax", "label_GT"):
                predicted = int(np.argmax(arr[0]))
                label_print_str = "Axial" if predicted == 0 else "Lateral"
                fig = plt.figure()
                plt.text(0.1, 0.4, label_print_str, size=60,
                         bbox=dict(boxstyle="square", ec=(1.0, 0.5, 0.5),
                                   fc=(1.0, 0.8, 0.8)))
                plt.close(fig)
            else:
                img_np = np.squeeze(tensor2im(arr[0], imtype=np.uint8))
                fig = plt.figure()
                plt.imshow(img_np if img_np.ndim == 2
                           else img_np[img_np.shape[0] // 2], cmap="gray")
                plt.close(fig)
            self.tb_writer.add_figure("train_images/" + label, fig, epoch)

    def display_model_hyperparameters(self):
        if self.tb_writer is None:
            return
        message = "--------------- Options ------------------  \n"
        for k, v in sorted(vars(self.opt).items()):
            message += "**{:>1}**: {:>10}  \n".format(str(k), str(v))
        message += "----------------- End -------------------"
        self.tb_writer.add_text("Model_hyperparameters", message)

    def display_current_histogram(self, visuals, epoch):
        if self.tb_writer is None or not self.display_histogram:
            return
        for label, image in visuals.items():
            self.tb_writer.add_histogram("train_histograms/" + label,
                                         np.asarray(_to_b1zyx(image)), epoch)

    def save_current_visuals(self, visuals, epoch):
        if not self.use_html:
            return
        for label, image in visuals.items():
            img_np = tensor2im(_to_b1zyx(image), imtype=np.uint8)
            tiffio.imwrite(os.path.join(self.img_dir, f"{epoch}_{label}.tif"), img_np)

    def plot_current_losses(self, plot_count, losses, is_epoch=False):
        if self.tb_writer is None:
            return
        tag = "train_by_epoch/" if is_epoch else "train_by_epoch_progress/"
        for label, loss in losses.items():
            self.tb_writer.add_scalar(tag + label, loss, plot_count)

    def print_current_losses(self, epoch, epoch_progress, losses, t_comp, t_data):
        message = ("(epoch: %d, epoch_progress: %d%%, iter time: %.3f, "
                   "data load time: %.3f) " % (epoch, epoch_progress, t_comp, t_data))
        for k, v in losses.items():
            message += "%s: %.3f " % (k, v)
        print(message)
        with open(self.log_name, "a") as log_file:
            log_file.write(f"{message}\n")


def save_images(webpage, visuals, image_path, aspect_ratio=1.0, width=256):
    """Per-item HTML gallery writer (util/visualizer.py:21-57).

    Accepts [0,1]-float visuals (reference contract) or already-quantised
    integer images (the tiled-inference outputs) — integers are min-max
    stretched to uint8 for the PNG thumbnails.  Links are emitted relative
    to the page so the gallery is portable (the reference wrote absolute
    paths, which broke when the results dir moved)."""
    import ntpath

    image_dir = webpage.get_image_dir()
    short_path = ntpath.basename(image_path[0] if isinstance(image_path, list)
                                 else image_path)
    name = os.path.splitext(short_path)[0]
    webpage.add_header(name)
    ims, txts, links = [], [], []
    for label, im_data in visuals.items():
        arr = np.squeeze(np.asarray(im_data))
        if np.issubdtype(arr.dtype, np.integer):
            lo, hi = float(arr.min()), float(arr.max())
            image_numpy = ((arr.astype(np.float32) - lo)
                           * (255.0 / max(hi - lo, 1.0))).astype(np.uint8)
        else:
            image_numpy = np.squeeze(tensor2im(arr, imtype=np.uint8))
        label_dir = os.path.join(image_dir, label)
        os.makedirs(label_dir, exist_ok=True)
        image_name = f"{name}_{label}.png"
        save_path = os.path.join(label_dir, image_name)
        from PIL import Image

        Image.fromarray(image_numpy if image_numpy.ndim == 2
                        else image_numpy[image_numpy.shape[0] // 2]).save(save_path)
        rel = os.path.relpath(save_path, webpage.web_dir)
        ims.append(rel)
        txts.append(label)
        links.append(rel)
    webpage.add_images(ims, txts, links, width=width)


def save_test_metrics(save_dir, opt, ssims, psnrs):
    """metrics.txt writer (util/visualizer.py:59-83)."""
    message = "Experiment Name: " + opt.name + "\n"
    message += "-------------------------------------------------\n"
    message += "Network Input vs. Groundtruth\n"
    message += ("(ssim_avg: %.4f, psnr_avg: %.4f, ssim_whole: %.4f, psnr_whole: %.4f)\n"
                % (ssims[0], psnrs[0], ssims[2], psnrs[2]))
    message += "-------------------------------------------------\n"
    message += "Network Output vs. Groundtruth\n"
    message += ("(ssim_avg: %.4f, psnr_avg: %.4f, ssim_whole: %.4f, psnr_whole: %.4f)\n"
                % (ssims[1], psnrs[1], ssims[3], psnrs[3]))
    message += "-------------------------------------------------"
    print(message)
    with open(os.path.join(save_dir, "metrics.txt"), "a") as f:
        f.write(f"{message}\n")
