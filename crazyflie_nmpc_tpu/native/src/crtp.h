// CRTP (Crazy RealTime Protocol) packet codec — the wire format the
// reference speaks to the Crazyflie firmware through crazyflie_cpp
// (SURVEY.md section 2.3: setpoint senders, log/param TOC, quatdecompress;
// use sites crazyflie_driver/src/crazyflie_server.cpp:268-403,519-651).
//
// This is a from-scratch implementation of the public protocol: fixed
// 1-byte header (port in bits 7:4, channel in bits 1:0) + <= 30 payload
// bytes.  Only plain C structs and explicit little-endian packing — no
// dependency on the reference library.
#pragma once

#include <cstdint>
#include <cstring>

namespace cfl {

constexpr std::size_t kMaxPayload = 30;

enum class Port : uint8_t {
  kConsole = 0x0,
  kParam = 0x2,
  kCommander = 0x3,
  kMem = 0x4,
  kLog = 0x5,
  kLocalization = 0x6,
  kGenericSetpoint = 0x7,
  kPlatform = 0xD,
  kLink = 0xF,
};

struct Packet {
  uint8_t header = 0;
  uint8_t size = 0;  // payload bytes
  uint8_t data[kMaxPayload] = {};

  static uint8_t MakeHeader(Port port, uint8_t channel) {
    return static_cast<uint8_t>((static_cast<uint8_t>(port) << 4) |
                                (channel & 0x3));
  }
  Port port() const { return static_cast<Port>(header >> 4); }
  uint8_t channel() const { return header & 0x3; }
};

// ---- little-endian field writers (host assumed LE on x86/ARM servers; a
// static_assert in crtp.cc guards this).
namespace detail {
template <typename T>
inline void Put(uint8_t* dst, std::size_t off, T v) {
  std::memcpy(dst + off, &v, sizeof(T));
}
template <typename T>
inline T Get(const uint8_t* src, std::size_t off) {
  T v;
  std::memcpy(&v, src + off, sizeof(T));
  return v;
}
}  // namespace detail

// ---- Commander attitude setpoint (port 3 ch 0): the cmd_vel contract —
// roll/pitch [deg], yaw rate [deg/s], thrust [PWM 0..65535]
// (crazyflie_server.cpp:344-357 sendSetpoint).
Packet EncodeSetpoint(float roll_deg, float pitch_deg, float yawrate_deg,
                      uint16_t thrust);
bool DecodeSetpoint(const Packet& p, float* roll, float* pitch,
                    float* yawrate, uint16_t* thrust);

// ---- Generic setpoints (port 7 ch 0, first byte = type).
enum class SetpointType : uint8_t {
  kStop = 0,
  kVelocityWorld = 1,
  kZDistance = 2,
  kHover = 5,
  kFullState = 6,
  kPosition = 7,
};

Packet EncodeStop();
Packet EncodeHover(float vx, float vy, float yawrate_deg, float z_distance);
Packet EncodePosition(float x, float y, float z, float yaw_deg);

// Full-state setpoint (compressed, 26 bytes + type): positions [mm],
// velocities [mm/s], accelerations [mm/s^2] as int16; attitude as
// smallest-three compressed quaternion; body rates [millirad/s] int16
// (crazyflie_server.cpp:268-276 sendFullStateSetpoint path).
struct FullState {
  float pos[3];    // [m]
  float vel[3];    // [m/s]
  float acc[3];    // [m/s^2]
  float quat[4];   // (w, x, y, z), unit
  float omega[3];  // [rad/s] body rates
};
Packet EncodeFullState(const FullState& s);
bool DecodeFullState(const Packet& p, FullState* out);

// ---- External position / pose (port 6 — localization).
Packet EncodeExternalPosition(float x, float y, float z);
bool DecodeExternalPosition(const Packet& p, float* x, float* y, float* z);
// external pose: generic localization channel (ch 1), type 8 ext-pose
Packet EncodeExternalPose(float x, float y, float z, const float quat[4]);

// ---- Log data (port 5 ch 2): block id + 3-byte timestamp + values blob
// (crazyflie_server.cpp:519-651 LogBlock streaming).
struct LogData {
  uint8_t block_id;
  uint32_t timestamp_ms;  // 24-bit on the wire
  uint8_t payload[26];
  uint8_t payload_size;
};
Packet EncodeLogData(const LogData& d);
bool DecodeLogData(const Packet& p, LogData* out);

// ---- Ping / keep-alive (port 15): sent when no setpoint was queued this
// cycle so the log stream stays alive (crazyflie_server.cpp:669-681).
Packet EncodePing();
bool IsPing(const Packet& p);

// ---- Smallest-three quaternion compression (the firmware scheme that
// crazyflie_cpp's quatdecompress undoes, crazyflie_server.cpp:853):
// 2 bits index of the largest-|.| component + 3 x 10-bit signed fixed
// point of the remaining components scaled by sqrt(2).
uint32_t QuatCompress(const float q[4]);
void QuatDecompress(uint32_t comp, float q[4]);

}  // namespace cfl
