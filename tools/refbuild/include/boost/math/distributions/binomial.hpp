/* boost::math binomial distribution shim for the reference's surface:
 * binomial_distribution<> b(n, p); cdf(complement(b, k)) == P(X > k)
 * (rnacore/binomial.cc).  Upper tail computed via the regularized
 * incomplete beta function (continued-fraction evaluation). */
#ifndef ALETSCH_SHIM_MATH_BINOMIAL_HPP
#define ALETSCH_SHIM_MATH_BINOMIAL_HPP

#include <cassert>
#include <cmath>
#include <cstdint>

namespace boost {
namespace math {

template <typename T = double>
class binomial_distribution {
public:
    binomial_distribution(T n, T p) : n_(n), p_(p) {}
    T trials() const { return n_; }
    T success_fraction() const { return p_; }

private:
    T n_, p_;
};

namespace detail {

/* regularized incomplete beta I_x(a, b) via Lentz continued fraction */
inline double betacf(double a, double b, double x) {
    const double eps = 3e-14, fpmin = 1e-300;
    double qab = a + b, qap = a + 1.0, qam = a - 1.0;
    double c = 1.0, d = 1.0 - qab * x / qap;
    if (std::fabs(d) < fpmin) d = fpmin;
    d = 1.0 / d;
    double h = d;
    for (int m = 1; m <= 500; m++) {
        int m2 = 2 * m;
        double aa = m * (b - m) * x / ((qam + m2) * (a + m2));
        d = 1.0 + aa * d;
        if (std::fabs(d) < fpmin) d = fpmin;
        c = 1.0 + aa / c;
        if (std::fabs(c) < fpmin) c = fpmin;
        d = 1.0 / d;
        h *= d * c;
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2));
        d = 1.0 + aa * d;
        if (std::fabs(d) < fpmin) d = fpmin;
        c = 1.0 + aa / c;
        if (std::fabs(c) < fpmin) c = fpmin;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (std::fabs(del - 1.0) < eps) break;
    }
    return h;
}

inline double ibeta(double a, double b, double x) {
    if (x <= 0.0) return 0.0;
    if (x >= 1.0) return 1.0;
    double lbeta = std::lgamma(a + b) - std::lgamma(a) - std::lgamma(b) +
                   a * std::log(x) + b * std::log(1.0 - x);
    double front = std::exp(lbeta);
    if (x < (a + 1.0) / (a + b + 2.0))
        return front * betacf(a, b, x) / a;
    return 1.0 - std::exp(std::lgamma(a + b) - std::lgamma(a) -
                          std::lgamma(b) + b * std::log(1.0 - x) +
                          a * std::log(x)) *
                     betacf(b, a, 1.0 - x) / b;
}

}  // namespace detail

template <typename Dist>
struct complemented2_type {
    const Dist& dist;
    double param;
};

template <typename Dist>
inline complemented2_type<Dist> complement(const Dist& d, double k) {
    return complemented2_type<Dist>{d, k};
}

/* P(X <= k) = I_{1-p}(n-k, k+1) */
template <typename T>
inline double cdf(const binomial_distribution<T>& d, double k) {
    double n = (double)d.trials(), p = (double)d.success_fraction();
    if (k < 0) return 0.0;
    if (k >= n) return 1.0;
    double kk = std::floor(k);
    return detail::ibeta(n - kk, kk + 1.0, 1.0 - p);
}

/* P(X > k) = I_p(k+1, n-k) */
template <typename T>
inline double cdf(const complemented2_type<binomial_distribution<T>>& c) {
    double n = (double)c.dist.trials();
    double p = (double)c.dist.success_fraction();
    double k = c.param;
    if (k < 0) return 1.0;
    if (k >= n) return 0.0;
    double kk = std::floor(k);
    return detail::ibeta(kk + 1.0, n - kk, p);
}

}  // namespace math
}  // namespace boost

#endif
