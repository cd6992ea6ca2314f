from .bitpack import BitReader, BitWriter, EndOfPacket, ilog
from .oggfile import OggPage, OggStreamReader, OggStreamWriter, ogg_crc
