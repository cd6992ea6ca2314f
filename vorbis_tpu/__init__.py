"""vorbis_tpu — a TPU-native Ogg Vorbis codec framework.

A from-scratch rebuild of the capabilities of libvorbis 1.3.7 + aoTuV
beta6.03 + Lancer (reference: spvkgn/vorbis-aotuv-lancer) designed for
TPU hardware: the DSP pipeline (windows, MDCT/FFT, psychoacoustics,
floor fitting, channel coupling, residue VQ, floor synthesis, IMDCT,
overlap-add) runs as batched JAX/XLA/Pallas kernels over many audio
frames per step; only Huffman bit I/O and Ogg framing run on the host.

Layout:
  bitstream/  host bit-level substrate (oggpack-style bit I/O, Ogg framing)
  codec/      codec state machines: headers, codebooks, encode/decode drivers
  ops/        device (JAX) DSP kernels: mdct, rdft, windows, floor, psy, VQ
  models/     quality-ladder mode templates (the codec "model zoo")
  parallel/   multi-chip sharding of the stream/frame batch axis
  utils/      scales (dB/Bark/octave), misc helpers
  data/       transcribed static tables (codebooks, mode templates) as .npz
"""

__version__ = "0.2.0"


def version_string() -> str:
    """Library version banner (reference: vorbis_version_string,
    info.c:734; the vendor string identifies aoTuV compatibility like
    info.c:35-43)."""
    return f"vorbis_tpu {__version__} (aoTuV b6.03-compatible, TPU-native)"


def __getattr__(name):
    # lazy top-level convenience API (avoids importing jax for users
    # who only touch the bitstream layer)
    if name == "encode_vbr_stream":
        from .codec.encoder import encode_vbr_stream
        return encode_vbr_stream
    if name == "decode_ogg":
        from .codec.decoder import decode_ogg
        return decode_ogg
    if name == "OggVorbisFile":
        from .vorbisfile import OggVorbisFile
        return OggVorbisFile
    if name == "decode_file":
        from .vorbisfile import decode_file
        return decode_file
    if name == "FastEncoder":
        from .models.fastenc import FastEncoder
        return FastEncoder
    if name == "FastDecoder":
        from .models.fastdec import FastDecoder
        return FastDecoder
    if name == "decode_ogg_fast":
        from .models.fastdec import decode_ogg_fast
        return decode_ogg_fast
    raise AttributeError(name)
