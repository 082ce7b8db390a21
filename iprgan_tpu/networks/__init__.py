"""Network registry (reference networks/__init__.py:1-10).

Networks are looked up by the string names used in the YAML configs.
"""

from iprgan_tpu.registry import NETWORKS
from iprgan_tpu.networks.conv_generator import ConvGenerator
from iprgan_tpu.networks.sn_discriminator import SNDiscriminator
from iprgan_tpu.networks.vae_nets import Decoder32, Encoder32
from iprgan_tpu.networks.sr_resnet import Discriminator96, SRResNet
from iprgan_tpu.networks.resnet_generator import (
    ConvDiscriminator,
    ResnetGenerator,
)
from iprgan_tpu.networks.vgg import VGG19Feature


@NETWORKS.register("ConvGenerator32")
def conv_generator_32(dtype=None):
    return ConvGenerator(mg=4, dtype=dtype)


@NETWORKS.register("ConvGenerator64")
def conv_generator_64(dtype=None):
    return ConvGenerator(mg=8, dtype=dtype)


@NETWORKS.register("SNDiscriminator32")
def sn_discriminator_32(dtype=None):
    return SNDiscriminator(md=4, dtype=dtype)


@NETWORKS.register("SNDiscriminator64")
def sn_discriminator_64(dtype=None):
    return SNDiscriminator(md=8, dtype=dtype)


@NETWORKS.register("Encoder32")
def encoder_32(dtype=None):
    return Encoder32(dtype=dtype)


@NETWORKS.register("Decoder32")
def decoder_32(dtype=None):
    return Decoder32(dtype=dtype)


@NETWORKS.register("SRResNet")
def sr_resnet(dtype=None):
    return SRResNet(dtype=dtype)


@NETWORKS.register("Discriminator96")
def discriminator_96(dtype=None):
    return Discriminator96(dtype=dtype)


@NETWORKS.register("VGG19Feature")
def vgg19_feature(dtype=None):
    return VGG19Feature(dtype=dtype)


@NETWORKS.register("Resnet9Blocks")
def resnet_9_blocks(dtype=None):
    return ResnetGenerator(n_block=9, dtype=dtype)


@NETWORKS.register("Resnet6Blocks")
def resnet_6_blocks(dtype=None):
    return ResnetGenerator(n_block=6, dtype=dtype)


@NETWORKS.register("ConvDiscriminator")
def conv_discriminator(dtype=None):
    return ConvDiscriminator(dtype=dtype)


__all__ = [
    "NETWORKS",
    "ConvGenerator",
    "SNDiscriminator",
    "Encoder32",
    "Decoder32",
    "SRResNet",
    "Discriminator96",
    "VGG19Feature",
    "ResnetGenerator",
    "ConvDiscriminator",
]
