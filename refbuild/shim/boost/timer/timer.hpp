/* Minimal boost::timer::cpu_timer stand-in (std::chrono based) so the
 * reference implementation's metric subsystem compiles without Boost.
 * Only the API surface used by metric/metric.hpp is provided:
 *   cpu_timer(), elapsed().wall (ns), is_stopped(), stop(), start(), resume().
 */
#ifndef SHIM_BOOST_TIMER_TIMER_HPP
#define SHIM_BOOST_TIMER_TIMER_HPP

#include <chrono>
#include <cstdint>

namespace boost {
namespace timer {

struct cpu_times
{
    std::int64_t wall;
    std::int64_t user;
    std::int64_t system;
};

class cpu_timer
{
public:
    cpu_timer() { this->start(); }

    void start()
    {
        this->mAccumulated = 0;
        this->mStart = Clock::now();
        this->mStopped = false;
    }

    void stop()
    {
        if (this->mStopped)
            return;
        this->mAccumulated += this->ElapsedSinceStart();
        this->mStopped = true;
    }

    void resume()
    {
        if (!this->mStopped)
            return;
        this->mStart = Clock::now();
        this->mStopped = false;
    }

    bool is_stopped() const { return this->mStopped; }

    cpu_times elapsed() const
    {
        const std::int64_t wall = this->mStopped ?
            this->mAccumulated :
            this->mAccumulated + this->ElapsedSinceStart();
        /* CPU (user/system) times are not split out; wall time is what the
         * reference's Metric::Timer consumes (metric.hpp:889-894). */
        return cpu_times { wall, wall, 0 };
    }

private:
    using Clock = std::chrono::steady_clock;

    std::int64_t ElapsedSinceStart() const
    {
        return std::chrono::duration_cast<std::chrono::nanoseconds>(
            Clock::now() - this->mStart).count();
    }

    Clock::time_point mStart;
    std::int64_t mAccumulated = 0;
    bool mStopped = true;
};

} /* namespace timer */
} /* namespace boost */

#endif
