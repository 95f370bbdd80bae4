#include "crtp.h"

#include <algorithm>
#include <cmath>

namespace cfl {

static_assert(sizeof(float) == 4, "float must be IEEE-754 binary32");

namespace {
// one byte of endianness paranoia: all fields are packed little-endian via
// memcpy; on big-endian hosts this codec would need byte swaps.
const uint16_t kOne = 1;
const bool kLittleEndian = *reinterpret_cast<const uint8_t*>(&kOne) == 1;

int16_t ToI16(float v) {
  float r = std::nearbyint(v);
  r = std::min(32767.0f, std::max(-32768.0f, r));
  return static_cast<int16_t>(r);
}
}  // namespace

using detail::Get;
using detail::Put;

Packet EncodeSetpoint(float roll_deg, float pitch_deg, float yawrate_deg,
                      uint16_t thrust) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kCommander, 0);
  p.size = 14;
  Put(p.data, 0, roll_deg);
  Put(p.data, 4, pitch_deg);
  Put(p.data, 8, yawrate_deg);
  Put(p.data, 12, thrust);
  return p;
}

bool DecodeSetpoint(const Packet& p, float* roll, float* pitch,
                    float* yawrate, uint16_t* thrust) {
  if (p.port() != Port::kCommander || p.size != 14) return false;
  *roll = Get<float>(p.data, 0);
  *pitch = Get<float>(p.data, 4);
  *yawrate = Get<float>(p.data, 8);
  *thrust = Get<uint16_t>(p.data, 12);
  return true;
}

Packet EncodeStop() {
  Packet p;
  p.header = Packet::MakeHeader(Port::kGenericSetpoint, 0);
  p.size = 1;
  p.data[0] = static_cast<uint8_t>(SetpointType::kStop);
  return p;
}

Packet EncodeHover(float vx, float vy, float yawrate_deg, float z_distance) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kGenericSetpoint, 0);
  p.size = 17;
  p.data[0] = static_cast<uint8_t>(SetpointType::kHover);
  Put(p.data, 1, vx);
  Put(p.data, 5, vy);
  Put(p.data, 9, yawrate_deg);
  Put(p.data, 13, z_distance);
  return p;
}

Packet EncodePosition(float x, float y, float z, float yaw_deg) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kGenericSetpoint, 0);
  p.size = 17;
  p.data[0] = static_cast<uint8_t>(SetpointType::kPosition);
  Put(p.data, 1, x);
  Put(p.data, 5, y);
  Put(p.data, 9, z);
  Put(p.data, 13, yaw_deg);
  return p;
}

Packet EncodeFullState(const FullState& s) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kGenericSetpoint, 0);
  p.size = 29;  // 1 type + 9*int16 + 4 quat + 3*int16
  p.data[0] = static_cast<uint8_t>(SetpointType::kFullState);
  std::size_t o = 1;
  for (int i = 0; i < 3; ++i, o += 2)
    Put(p.data, o, ToI16(s.pos[i] * 1000.0f));
  for (int i = 0; i < 3; ++i, o += 2)
    Put(p.data, o, ToI16(s.vel[i] * 1000.0f));
  for (int i = 0; i < 3; ++i, o += 2)
    Put(p.data, o, ToI16(s.acc[i] * 1000.0f));
  Put(p.data, o, QuatCompress(s.quat));
  o += 4;
  for (int i = 0; i < 3; ++i, o += 2)
    Put(p.data, o, ToI16(s.omega[i] * 1000.0f));
  return p;
}

bool DecodeFullState(const Packet& p, FullState* out) {
  if (p.port() != Port::kGenericSetpoint || p.size != 29 ||
      p.data[0] != static_cast<uint8_t>(SetpointType::kFullState))
    return false;
  std::size_t o = 1;
  for (int i = 0; i < 3; ++i, o += 2)
    out->pos[i] = Get<int16_t>(p.data, o) * 1e-3f;
  for (int i = 0; i < 3; ++i, o += 2)
    out->vel[i] = Get<int16_t>(p.data, o) * 1e-3f;
  for (int i = 0; i < 3; ++i, o += 2)
    out->acc[i] = Get<int16_t>(p.data, o) * 1e-3f;
  QuatDecompress(Get<uint32_t>(p.data, o), out->quat);
  o += 4;
  for (int i = 0; i < 3; ++i, o += 2)
    out->omega[i] = Get<int16_t>(p.data, o) * 1e-3f;
  return true;
}

Packet EncodeExternalPosition(float x, float y, float z) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kLocalization, 0);
  p.size = 12;
  Put(p.data, 0, x);
  Put(p.data, 4, y);
  Put(p.data, 8, z);
  return p;
}

bool DecodeExternalPosition(const Packet& p, float* x, float* y, float* z) {
  if (p.port() != Port::kLocalization || p.channel() != 0 || p.size != 12)
    return false;
  *x = Get<float>(p.data, 0);
  *y = Get<float>(p.data, 4);
  *z = Get<float>(p.data, 8);
  return true;
}

Packet EncodeExternalPose(float x, float y, float z, const float quat[4]) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kLocalization, 1);
  p.size = 17;
  p.data[0] = 8;  // generic-loc ext-pose type
  Put(p.data, 1, x);
  Put(p.data, 5, y);
  Put(p.data, 9, z);
  Put(p.data, 13, QuatCompress(quat));
  return p;
}

Packet EncodeLogData(const LogData& d) {
  Packet p;
  p.header = Packet::MakeHeader(Port::kLog, 2);
  p.size = static_cast<uint8_t>(4 + d.payload_size);
  p.data[0] = d.block_id;
  p.data[1] = static_cast<uint8_t>(d.timestamp_ms & 0xFF);
  p.data[2] = static_cast<uint8_t>((d.timestamp_ms >> 8) & 0xFF);
  p.data[3] = static_cast<uint8_t>((d.timestamp_ms >> 16) & 0xFF);
  std::memcpy(p.data + 4, d.payload, d.payload_size);
  return p;
}

bool DecodeLogData(const Packet& p, LogData* out) {
  if (p.port() != Port::kLog || p.channel() != 2 || p.size < 4) return false;
  out->block_id = p.data[0];
  out->timestamp_ms = static_cast<uint32_t>(p.data[1]) |
                      (static_cast<uint32_t>(p.data[2]) << 8) |
                      (static_cast<uint32_t>(p.data[3]) << 16);
  out->payload_size = static_cast<uint8_t>(p.size - 4);
  std::memcpy(out->payload, p.data + 4, out->payload_size);
  return true;
}

Packet EncodePing() {
  Packet p;
  p.header = Packet::MakeHeader(Port::kLink, 3);
  p.size = 0;
  return p;
}

bool IsPing(const Packet& p) {
  return p.port() == Port::kLink && p.channel() == 3 && p.size == 0;
}

uint32_t QuatCompress(const float q[4]) {
  // smallest-three: find largest-|.| component, store its index; encode the
  // other three as signed 10-bit fixed point over [-1/sqrt2, 1/sqrt2],
  // negating the quaternion if the largest component is negative (q and -q
  // are the same rotation).
  unsigned largest = 0;
  for (unsigned i = 1; i < 4; ++i)
    if (std::fabs(q[i]) > std::fabs(q[largest])) largest = i;
  const float sign = q[largest] < 0 ? -1.0f : 1.0f;
  const float kSqrt2 = 1.41421356237f;
  uint32_t comp = largest;
  for (unsigned i = 0; i < 4; ++i) {
    if (i == largest) continue;
    const float v = sign * q[i];
    const int neg = v < 0;
    const uint32_t mag = static_cast<uint32_t>(
        std::min(511.0f, std::nearbyint(511.0f * kSqrt2 * std::fabs(v))));
    comp = (comp << 10) | (static_cast<uint32_t>(neg) << 9) | mag;
  }
  return comp;
}

void QuatDecompress(uint32_t comp, float q[4]) {
  const float kSqrt1_2 = 0.70710678118f;
  const unsigned largest = comp >> 30;
  float sum_sq = 0.0f;
  for (int i = 3; i >= 0; --i) {
    if (static_cast<unsigned>(i) == largest) continue;
    const unsigned mag = comp & 0x1FF;
    const unsigned neg = (comp >> 9) & 0x1;
    comp >>= 10;
    q[i] = (kSqrt1_2 * static_cast<float>(mag)) / 511.0f;
    if (neg) q[i] = -q[i];
    sum_sq += q[i] * q[i];
  }
  q[largest] = std::sqrt(std::max(0.0f, 1.0f - sum_sq));
}

}  // namespace cfl
