#include "http/router.h"

namespace gabby::http {

void Router::Handle(Request& req, ResponseWriter& resp) const {
    for (const auto& route : routes_) {
        if (std::regex_match(req.path, route.re)) {
            route.handler(req, resp);
            return;
        }
    }
    throw NotFoundException("no route for " + req.path);
}

}  // namespace gabby::http
