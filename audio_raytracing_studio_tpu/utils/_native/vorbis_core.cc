// Native hot loops for the Ogg/Vorbis codec (utils/vorbisenc.py /
// vorbisio.py).
//
// Built on demand by utils/_native_vorbis.py (same scheme as flac_core.cc).

#include <cstdint>

extern "C" {

// LSB-first bit packer: item i contributes the low nbits[i] bits of
// values[i], in order.  `out` must be zeroed and sized (sum(nbits)+7)/8.
// Returns the total number of bits written.
int64_t vorbis_pack_lsb(const int32_t* values, const uint8_t* nbits,
                        int64_t n, uint8_t* out) {
  uint64_t acc = 0;
  int navail = 0;
  int64_t bytepos = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int nb = nbits[i];
    if (nb == 0) continue;
    acc |= ((uint64_t)(uint32_t)values[i] & ((nb >= 32) ? 0xFFFFFFFFu
                                                        : ((1u << nb) - 1u)))
           << navail;
    navail += nb;
    while (navail >= 8) {
      out[bytepos++] = (uint8_t)(acc & 0xFF);
      acc >>= 8;
      navail -= 8;
    }
  }
  if (navail > 0) out[bytepos++] = (uint8_t)(acc & 0xFF);
  return bytepos * 8 - ((8 - navail) & 7);
}

// Ogg page CRC: poly 0x04C11DB7, init 0, no reflection, no final xor.
uint32_t vorbis_ogg_crc(const uint8_t* data, int64_t n) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; ++j)
        r = (r & 0x80000000u) ? (r << 1) ^ 0x04C11DB7u : (r << 1);
      table[i] = r;
    }
    init = true;
  }
  uint32_t crc = 0;
  for (int64_t i = 0; i < n; ++i)
    crc = (crc << 8) ^ table[((crc >> 24) ^ data[i]) & 0xFF];
  return crc;
}

}  // extern "C"
