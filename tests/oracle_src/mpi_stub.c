/* Single-rank MPI stub: rank 0, size 1, with self-delivery message queues so
 * ring sends to self (pipeline of one stage) work. Test-oracle use only. */
#include "mpi.h"
#include <stdlib.h>
#include <string.h>

struct msg { int tag; int count_bytes; void *data; struct msg *next; };
static struct msg *q_head = NULL, *q_tail = NULL;

static int dt_size(MPI_Datatype dt) {
    if (dt == MPI_INT || dt == MPI_FLOAT || dt == MPI_INT32_T) return 4;
    if (dt == MPI_UINT16_T) return 2;
    return 1; /* int8, byte */
}

int MPI_Init_thread(int *argc, char ***argv, int required, int *provided) {
    (void)argc; (void)argv; (void)required;
    if (provided) *provided = MPI_THREAD_FUNNELED;
    return MPI_SUCCESS;
}
int MPI_Finalize(void) { return MPI_SUCCESS; }
int MPI_Comm_rank(MPI_Comm comm, int *rank) { *rank = (comm == MPI_COMM_NULL) ? -1 : 0; return MPI_SUCCESS; }
int MPI_Comm_size(MPI_Comm comm, int *size) { *size = (comm == MPI_COMM_NULL) ? 0 : 1; return MPI_SUCCESS; }
int MPI_Comm_split(MPI_Comm comm, int color, int key, MPI_Comm *newcomm) {
    /* Real MPI returns MPI_COMM_NULL for color=MPI_UNDEFINED, which on a
     * 1-rank world would kill whichever pipeline this rank isn't the head
     * of (speculative_orig/speculative.cpp:80 gives the draft comm color
     * -1 on rank 0, making every draft-context call a no-op -> zero
     * logits). For a single-process oracle the right semantics is "this
     * rank heads EVERY pipeline": always hand back a valid comm. */
    (void)key; (void)color; *newcomm = comm; return MPI_SUCCESS;
}
int MPI_Comm_free(MPI_Comm *comm) { (void)comm; return MPI_SUCCESS; }
int MPI_Barrier(MPI_Comm comm) { (void)comm; return MPI_SUCCESS; }
int MPI_Bcast(void *b, int c, MPI_Datatype d, int r, MPI_Comm cm) { (void)b;(void)c;(void)d;(void)r;(void)cm; return MPI_SUCCESS; }
int MPI_Scatter(const void *sb, int sc, MPI_Datatype st, void *rb, int rc, MPI_Datatype rt, int root, MPI_Comm cm) {
    (void)rc; (void)rt; (void)root; (void)cm;
    if (sb && rb) memcpy(rb, sb, (size_t)sc * dt_size(st));
    return MPI_SUCCESS;
}
static int enqueue(const void *buf, int count, MPI_Datatype dt, int tag) {
    struct msg *m = (struct msg *)malloc(sizeof *m);
    m->tag = tag; m->count_bytes = count * dt_size(dt);
    m->data = malloc(m->count_bytes); memcpy(m->data, buf, m->count_bytes);
    m->next = NULL;
    if (q_tail) q_tail->next = m; else q_head = m;
    q_tail = m;
    return MPI_SUCCESS;
}
int MPI_Send(const void *b, int c, MPI_Datatype d, int dest, int tag, MPI_Comm cm) { (void)dest;(void)cm; return enqueue(b,c,d,tag); }
int MPI_Bsend(const void *b, int c, MPI_Datatype d, int dest, int tag, MPI_Comm cm) { (void)dest;(void)cm; return enqueue(b,c,d,tag); }
static struct msg **find(int tag) {
    struct msg **pp = &q_head;
    while (*pp) { if (tag == MPI_ANY_TAG || (*pp)->tag == tag) return pp; pp = &(*pp)->next; }
    return NULL;
}
int MPI_Recv(void *buf, int count, MPI_Datatype dt, int src, int tag, MPI_Comm cm, MPI_Status *st) {
    (void)src; (void)cm;
    struct msg **pp = find(tag);
    if (!pp) { abort(); } /* would deadlock in real MPI */
    struct msg *m = *pp;
    int n = count * dt_size(dt);
    if (m->count_bytes < n) n = m->count_bytes;
    memcpy(buf, m->data, n);
    if (st && st != MPI_STATUS_IGNORE) { st->MPI_SOURCE = 0; st->MPI_TAG = m->tag; st->_ucount = m->count_bytes; }
    *pp = m->next;
    if (!*pp && q_tail == m) { struct msg *t = q_head; q_tail = NULL; while (t) { q_tail = t; t = t->next; } }
    if (q_tail == m) q_tail = NULL;
    free(m->data); free(m);
    return MPI_SUCCESS;
}
int MPI_Irecv(void *b, int c, MPI_Datatype d, int s, int t, MPI_Comm cm, MPI_Request *r) {
    *r = (MPI_Request)0; return MPI_Recv(b, c, d, s, t, cm, MPI_STATUS_IGNORE);
}
int MPI_Wait(MPI_Request *r, MPI_Status *s) { (void)r; (void)s; return MPI_SUCCESS; }
int MPI_Probe(int src, int tag, MPI_Comm cm, MPI_Status *st) {
    (void)src; (void)cm;
    struct msg **pp = find(tag);
    if (!pp) abort();
    if (st && st != MPI_STATUS_IGNORE) { st->MPI_SOURCE = 0; st->MPI_TAG = (*pp)->tag; st->_ucount = (*pp)->count_bytes; }
    return MPI_SUCCESS;
}
int MPI_Iprobe(int src, int tag, MPI_Comm cm, int *flag, MPI_Status *st) {
    (void)src; (void)cm;
    struct msg **pp = find(tag);
    *flag = pp != NULL;
    if (pp && st && st != MPI_STATUS_IGNORE) { st->MPI_SOURCE = 0; st->MPI_TAG = (*pp)->tag; st->_ucount = (*pp)->count_bytes; }
    return MPI_SUCCESS;
}
int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count) {
    *count = st ? (int)(st->_ucount / dt_size(dt)) : 0; return MPI_SUCCESS;
}
int MPI_Buffer_attach(void *b, int s) { (void)b; (void)s; return MPI_SUCCESS; }
int MPI_Buffer_detach(void *b, int *s) { (void)b; if (s) *s = 0; return MPI_SUCCESS; }
