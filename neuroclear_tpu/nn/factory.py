"""Network factories mirroring the reference define_G / define_D dispatch
(models/networks.py:140-247).  The --netG / --netD CLI strings are identical.
"""

from __future__ import annotations

from . import discriminators as D
from . import generators as G


def define_G(input_nc, output_nc, ngf, netG, norm="batch", use_dropout=False,
             kernel_size=9, given_psf=None, noise_setting=None, dimension=3):
    """Return a generator module (call .init(key, init_type, gain) yourself —
    device placement/DataParallel of the reference init_net is replaced by the
    caller's pjit sharding)."""
    if netG == "unet_twoouts":
        return G.UNetTwoOuts(4, output_nc, dim=dimension)
    if netG == "unet_deconv":
        return G.UNetDeconv(1, output_nc, norm=norm, dim=dimension)
    if netG == "unet_vanilla":
        return G.UNetVanilla(1, output_nc, norm=norm, dim=dimension)
    if netG == "resnet_9blocks":
        return G.ResnetGenerator(input_nc, output_nc, ngf, norm=norm, n_blocks=9)
    if netG == "resnet_6blocks":
        return G.ResnetGenerator(input_nc, output_nc, ngf, norm=norm, n_blocks=6)
    if netG == "VGG":
        return G.VGGNet(input_nc, num_classes=2, vgg_type="VGG16")
    if netG == "linearkernel":
        return G.LinearKernel(input_nc, output_nc, kernel_size, dim=dimension)
    if netG == "linearkernel_double":
        return G.LinearKernel(input_nc, output_nc, kernel_size, dim=dimension, double=True)
    if netG == "linearkernel_LK31":
        return G.LinearKernel(input_nc, output_nc, 31, dim=dimension)
    if netG == "linearkernel_NC":
        return G.LinearKernelNC(input_nc, output_nc, kernel_size, dim=dimension)
    if netG == "fixed_kernel":
        ks = tuple(given_psf.shape[-dimension:]) if given_psf is not None else (9,) * dimension
        sigma, peak = noise_setting if noise_setting is not None else (0.1, 0.1)
        return G.FixedLinearKernel(ks, sigma, peak, dim=dimension)
    if netG == "deep_linear_gen":
        return G.DeepLinearGenerator(input_nc, output_nc, dim=dimension)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")


def define_D(input_nc, ndf, netD, n_layers_D=3, norm="batch", use_sigmoid=False,
             dimension=3):
    if netD == "basic":
        return D.NLayerDiscriminator(input_nc, ndf, 3, norm, use_sigmoid, dimension)
    if netD == "basic_SN":
        return D.NLayerDiscriminator(input_nc, ndf, 3, norm, use_sigmoid, dimension,
                                     spectral=True)
    if netD == "n_layers":
        return D.NLayerDiscriminator(input_nc, ndf, n_layers_D, norm, use_sigmoid,
                                     dimension)
    if netD == "n_layers_SN":
        return D.NLayerDiscriminator(input_nc, ndf, n_layers_D, norm, use_sigmoid,
                                     dimension, spectral=True)
    if netD == "pixel":
        return D.PixelDiscriminator(input_nc, ndf, norm, dimension)
    if netD == "kernelGAN":
        return D.KernelPatchDiscriminator(input_nc, ndf, 5, norm, dimension)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
