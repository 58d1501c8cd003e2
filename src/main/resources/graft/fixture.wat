WARC/1.0
WARC-Type: warcinfo
WARC-Record-ID: <urn:uuid:wat-0>
WARC-Date: 2024-03-01T00:00:00Z
Content-Length: 26

software: graftbot-wat/1.0

WARC/1.0
WARC-Type: metadata
WARC-Target-URI: http://example.org/a
WARC-Record-ID: <urn:uuid:wat-1>
WARC-Date: 2024-03-01T00:00:01Z
Content-Length: 262

{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"http://example.org/a"},"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[{"path":"A@/href","url":"https://example.net/b"},{"path":"A@/href","url":"https://www.example.org/about"}]}}}}}

WARC/1.0
WARC-Type: metadata
WARC-Target-URI: https://example.net/b
WARC-Record-ID: <urn:uuid:wat-2>
WARC-Date: 2024-03-01T00:00:02Z
Content-Length: 205

{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"https://example.net/b"},"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[{"path":"A@/href","url":"http://example.org/a"}]}}}}}

