// Ordered regex router: first full match wins, 404 fallback.
// Same capability as /root/reference/src/http/router.h:12-36.
#ifndef GABBY_HTTP_ROUTER_H_
#define GABBY_HTTP_ROUTER_H_

#include <regex>
#include <string>
#include <utility>
#include <vector>

#include "http/types.h"

namespace gabby::http {

class Router {
   public:
    class Builder;

    void Handle(Request& req, ResponseWriter& resp) const;

   private:
    struct Route {
        std::string pattern;
        std::regex re;
        Handler handler;
    };
    std::vector<Route> routes_;
    friend class Builder;
};

class Router::Builder {
   public:
    Builder& route(const std::string& pattern, Handler handler) {
        router_.routes_.push_back(
            {pattern, std::regex(pattern), std::move(handler)});
        return *this;
    }

    // Produces a Handler closure owning the router.
    Handler build() {
        auto router = std::make_shared<Router>(std::move(router_));
        return [router](Request& req, ResponseWriter& resp) {
            router->Handle(req, resp);
        };
    }

   private:
    Router router_;
};

}  // namespace gabby::http

#endif  // GABBY_HTTP_ROUTER_H_
