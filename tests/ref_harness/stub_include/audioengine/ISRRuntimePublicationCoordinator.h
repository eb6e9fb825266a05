// Shadow stub of the reference's ISRRuntimePublicationCoordinator.h for
// the EQ dump harness.  The real header drags in the full ISR handle
// table, whose 16-byte atomic DSPHandle static-asserts lock-freedom —
// not satisfiable on g++/libstdc++.  EQProcessor.Core.cpp touches only
// the retire-enqueue surface below, and the dump harness leaves
// m_retireCoordinator null, so every deferred retire takes the
// guarded-drop path (EQProcessor.Core.cpp:37-41: coordinator absent =>
// drop, i.e. the superseded state leaks instead of being deferred-freed)
// — the RCU parameter-swap semantics the harness pins are unaffected.
#pragma once

#include <cstdint>

#include "core/EpochDomain.h"

namespace convo::isr {

enum class RetireAuthority : uint8_t { Granted = 1 };

enum class RetireEnqueueResult : uint8_t {
    Success = 0,
    QueueFull = 1,
    Rejected = 2,
};

class ISRRetireRouter {
public:
    explicit ISRRetireRouter(convo::IEpochProvider&) noexcept {}
    ISRRetireRouter(const ISRRetireRouter&) = delete;
    ISRRetireRouter& operator=(const ISRRetireRouter&) = delete;

    RetireEnqueueResult enqueueWithRetry(void*, void (*)(void*), uint64_t,
                                         DeletionEntryType) noexcept {
        return RetireEnqueueResult::Rejected;   // harness: drop (leak)
    }
};

class RuntimePublicationCoordinator {
public:
    RetireEnqueueResult enqueueRetire(RetireAuthority, ISRRetireRouter&,
                                      void*, void (*)(void*),
                                      uint64_t) noexcept {
        return RetireEnqueueResult::Rejected;
    }
};

}  // namespace convo::isr
