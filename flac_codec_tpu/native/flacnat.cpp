// Native host engine for the TPU FLAC framework.
//
// Plays the role the Rust bit engine plays in the reference
// (reference: external crate bitstream-io + src/crc.rs): the bit-serial
// host loops that cannot ride the TPU's vector units — CRC, Rice
// pack/unpack, bit-blob concatenation, and the sequential inverse-LPC
// recurrence used by the host decode path.  The device plane (JAX/Pallas)
// produces/consumes whole arrays; this file turns them into FLAC bits.
//
// Build: g++ -O3 -march=native -shared -fPIC flacnat.cpp -o libflacnat.so
// Exposed via ctypes (see build.py); pure C ABI, no pybind11.

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// CRC (reference: src/crc.rs — poly 0x07 / 0x8005, init 0, residue-0 validity)
// ---------------------------------------------------------------------------

static uint8_t CRC8_TABLE[256];
static uint16_t CRC16_TABLE[256];
static bool tables_ready = false;

static void init_tables() {
    for (int i = 0; i < 256; i++) {
        uint32_t c8 = (uint32_t)i;
        for (int k = 0; k < 8; k++)
            c8 = (c8 & 0x80) ? ((c8 << 1) ^ 0x07) & 0xFF : (c8 << 1) & 0xFF;
        CRC8_TABLE[i] = (uint8_t)c8;
        uint32_t c16 = (uint32_t)i << 8;
        for (int k = 0; k < 8; k++)
            c16 = (c16 & 0x8000) ? ((c16 << 1) ^ 0x8005) & 0xFFFF : (c16 << 1) & 0xFFFF;
        CRC16_TABLE[i] = (uint16_t)c16;
    }
    tables_ready = true;
}

uint32_t nat_crc8(const uint8_t* data, size_t n, uint32_t crc) {
    if (!tables_ready) init_tables();
    for (size_t i = 0; i < n; i++) crc = CRC8_TABLE[(crc ^ data[i]) & 0xFF];
    return crc;
}

uint32_t nat_crc16(const uint8_t* data, size_t n, uint32_t crc) {
    if (!tables_ready) init_tables();
    for (size_t i = 0; i < n; i++)
        crc = (uint32_t)CRC16_TABLE[((crc >> 8) ^ data[i]) & 0xFF] ^ ((crc << 8) & 0xFFFF);
    return crc;
}

// ---------------------------------------------------------------------------
// Bit packing (MSB-first).  Output buffer must be zero-initialised past
// bitpos; writes OR into place so device-packed blobs can be merged.
// ---------------------------------------------------------------------------

static inline void or_bits(uint8_t* out, uint64_t bitpos, uint64_t value, uint32_t nbits) {
    // Write `nbits` low bits of `value` at `bitpos`, MSB-first.
    while (nbits > 0) {
        uint64_t byte = bitpos >> 3;
        uint32_t bit_in_byte = (uint32_t)(bitpos & 7);
        uint32_t room = 8 - bit_in_byte;
        uint32_t take = nbits < room ? nbits : room;
        uint32_t shift = nbits - take;           // bits remaining after this chunk
        uint8_t chunk = (uint8_t)((value >> shift) & ((1u << take) - 1));
        out[byte] |= (uint8_t)(chunk << (room - take));
        bitpos += take;
        nbits -= take;
    }
}

uint64_t nat_pack_symbols(uint8_t* out, uint64_t bitpos,
                          const uint64_t* values, const uint32_t* nbits, size_t n) {
    for (size_t i = 0; i < n; i++) {
        or_bits(out, bitpos, values[i], nbits[i]);
        bitpos += nbits[i];
    }
    return bitpos;
}

// Rice-encode residuals (reference zigzag + unary-of-zeros-then-1 + k LSBs;
// reference: src/stream.rs:3044-3078).
uint64_t nat_pack_rice(uint8_t* out, uint64_t bitpos,
                       const int32_t* res, size_t n, uint32_t k) {
    for (size_t i = 0; i < n; i++) {
        int32_t v = res[i];
        uint32_t u = v < 0 ? ((((uint32_t)(-(int64_t)v)) - 1u) << 1) + 1u
                           : ((uint32_t)v) << 1;
        uint32_t q = u >> k;
        // q zero bits then a 1, then k LSBs
        bitpos += q;                              // zeros are implicit (buffer zeroed)
        or_bits(out, bitpos, ((uint64_t)1 << k) | (u & ((k ? ((1u << k) - 1u) : 0u))), k + 1);
        bitpos += k + 1;
    }
    return bitpos;
}

// Decode n Rice residuals with parameter k from buf starting at bitpos.
uint64_t nat_unpack_rice(const uint8_t* buf, uint64_t bitpos,
                         int32_t* res, size_t n, uint32_t k) {
    for (size_t i = 0; i < n; i++) {
        // unary: count zero bits until a 1
        uint32_t q = 0;
        for (;;) {
            uint64_t byte = bitpos >> 3;
            uint32_t bit_in_byte = (uint32_t)(bitpos & 7);
            uint8_t cur = (uint8_t)(buf[byte] << bit_in_byte);   // bits from pos left-aligned
            if (cur == 0) {
                q += 8 - bit_in_byte;
                bitpos += 8 - bit_in_byte;
            } else {
                // leading zeros of cur (cur != 0)
                uint32_t lz = (uint32_t)__builtin_clz((uint32_t)cur) - 24u;
                q += lz;
                bitpos += lz + 1;                 // consume the terminating 1
                break;
            }
        }
        uint32_t lsb = 0;
        for (uint32_t got = 0; got < k;) {
            uint64_t byte = bitpos >> 3;
            uint32_t bit_in_byte = (uint32_t)(bitpos & 7);
            uint32_t room = 8 - bit_in_byte;
            uint32_t take = (k - got) < room ? (k - got) : room;
            uint8_t chunk = (uint8_t)((buf[byte] >> (room - take)) & ((1u << take) - 1));
            lsb = (lsb << take) | chunk;
            bitpos += take;
            got += take;
        }
        uint32_t u = (q << k) | lsb;
        res[i] = (u & 1) ? -((int32_t)(u >> 1)) - 1 : (int32_t)(u >> 1);
    }
    return bitpos;
}

// Read n signed two's-complement values of `width` bits (escaped partitions,
// verbatim subframes, warm-up samples).
uint64_t nat_unpack_signed(const uint8_t* buf, uint64_t bitpos,
                           int64_t* res, size_t n, uint32_t width) {
    if (width == 0) { for (size_t i = 0; i < n; i++) res[i] = 0; return bitpos; }
    for (size_t i = 0; i < n; i++) {
        uint64_t v = 0;
        for (uint32_t got = 0; got < width;) {
            uint64_t byte = bitpos >> 3;
            uint32_t bit_in_byte = (uint32_t)(bitpos & 7);
            uint32_t room = 8 - bit_in_byte;
            uint32_t take = (width - got) < room ? (width - got) : room;
            uint8_t chunk = (uint8_t)((buf[byte] >> (room - take)) & ((1u << take) - 1));
            v = (v << take) | chunk;
            bitpos += take;
            got += take;
        }
        // sign-extend
        if (v & ((uint64_t)1 << (width - 1))) v |= ~(((uint64_t)1 << width) - 1);
        res[i] = (int64_t)v;
    }
    return bitpos;
}

uint64_t nat_pack_signed(uint8_t* out, uint64_t bitpos,
                         const int64_t* vals, size_t n, uint32_t width) {
    uint64_t mask = width >= 64 ? ~(uint64_t)0 : (((uint64_t)1 << width) - 1);
    for (size_t i = 0; i < n; i++) {
        or_bits(out, bitpos, (uint64_t)vals[i] & mask, width);
        bitpos += width;
    }
    return bitpos;
}

// Append a bit blob: `nbits` bits of src (starting at src bit 0, MSB-first)
// appended at out:bitpos.  Replaces the reference's BitRecorder playback
// (reference: src/encode.rs:2332-2333).
uint64_t nat_append_bits(uint8_t* out, uint64_t bitpos,
                         const uint8_t* src, uint64_t nbits) {
    uint64_t full = nbits >> 3;
    uint32_t rem = (uint32_t)(nbits & 7);
    if ((bitpos & 7) == 0) {
        memcpy(out + (bitpos >> 3), src, full);
        bitpos += full << 3;
    } else {
        for (uint64_t i = 0; i < full; i++) {
            or_bits(out, bitpos, src[i], 8);
            bitpos += 8;
        }
    }
    if (rem) {
        or_bits(out, bitpos, src[full] >> (8 - rem), rem);
        bitpos += rem;
    }
    return bitpos;
}

// ---------------------------------------------------------------------------
// Inverse LPC recurrence (host decode path).
// x[n] += (sum_j q[j] * x[n-1-j]) >> shift, int64 accumulator
// (reference: src/decode.rs:1738-1752).  Works for fixed predictors too by
// passing the fixed coefficient rows.
// ---------------------------------------------------------------------------

void nat_lpc_predict64(int64_t* x, size_t n, const int32_t* q,
                       uint32_t order, uint32_t shift) {
    for (size_t i = order; i < n; i++) {
        int64_t acc = 0;
        for (uint32_t j = 0; j < order; j++)
            acc += (int64_t)q[j] * x[i - 1 - j];
        x[i] += acc >> shift;
    }
}

void nat_lpc_predict32(int32_t* x, size_t n, const int32_t* q,
                       uint32_t order, uint32_t shift) {
    for (size_t i = order; i < n; i++) {
        int64_t acc = 0;
        for (uint32_t j = 0; j < order; j++)
            acc += (int64_t)q[j] * x[i - 1 - j];
        x[i] += (int32_t)(acc >> shift);
    }
}

// Compute LPC residuals r[n] = x[n] - ((sum q[j]*x[n-1-j]) >> shift)
// (encoder hot loop; reference: src/encode.rs:3174-3203).  Returns 1 on
// i32 overflow of any residual (caller maps to ResidualOverflow).
int32_t nat_lpc_residuals(const int64_t* x, size_t n, const int32_t* q,
                          uint32_t order, uint32_t shift, int32_t* res) {
    for (size_t i = order; i < n; i++) {
        int64_t acc = 0;
        for (uint32_t j = 0; j < order; j++)
            acc += (int64_t)q[j] * x[i - 1 - j];
        int64_t r = x[i] - (acc >> shift);
        if (r < INT32_MIN || r > INT32_MAX) return 1;
        res[i - order] = (int32_t)r;
    }
    return 0;
}

}  // extern "C"
