/* Minimal OpenMPI-ABI mpi.h shim for compiling the reference against the
 * system libmpi.so.40 (headers absent in this image). Test-oracle use only.
 * Declares exactly the subset the reference uses, with OpenMPI's real ABI:
 * opaque pointer handles + exported predefined-handle globals. */
#ifndef MPI_SHIM_H
#define MPI_SHIM_H
#include <stddef.h>
#ifdef __cplusplus
extern "C" {
#endif

typedef struct ompi_communicator_t *MPI_Comm;
typedef struct ompi_datatype_t *MPI_Datatype;
typedef struct ompi_request_t *MPI_Request;
typedef struct ompi_status_public_t {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
    int _cancelled;
    size_t _ucount;
} MPI_Status;

extern struct ompi_communicator_t ompi_mpi_comm_world;
extern struct ompi_communicator_t ompi_mpi_comm_null;
extern struct ompi_datatype_t ompi_mpi_int;
extern struct ompi_datatype_t ompi_mpi_float;
extern struct ompi_datatype_t ompi_mpi_int8_t;
extern struct ompi_datatype_t ompi_mpi_int32_t;
extern struct ompi_datatype_t ompi_mpi_uint16_t;
extern struct ompi_datatype_t ompi_mpi_byte;

#define MPI_COMM_WORLD (&ompi_mpi_comm_world)
#define MPI_COMM_NULL  (&ompi_mpi_comm_null)
#define MPI_INT        (&ompi_mpi_int)
#define MPI_FLOAT      (&ompi_mpi_float)
#define MPI_INT8_T     (&ompi_mpi_int8_t)
#define MPI_INT32_T    (&ompi_mpi_int32_t)
#define MPI_UINT16_T   (&ompi_mpi_uint16_t)
#define MPI_BYTE       (&ompi_mpi_byte)

#define MPI_SUCCESS 0
#define MPI_ANY_SOURCE -1
#define MPI_ANY_TAG -1
#define MPI_UNDEFINED -32766
#define MPI_STATUS_IGNORE ((MPI_Status *)0)
#define MPI_THREAD_SINGLE 0
#define MPI_THREAD_FUNNELED 1
#define MPI_THREAD_SERIALIZED 2
#define MPI_THREAD_MULTIPLE 3
#define MPI_BSEND_OVERHEAD 128

int MPI_Init_thread(int *argc, char ***argv, int required, int *provided);
int MPI_Finalize(void);
int MPI_Comm_rank(MPI_Comm comm, int *rank);
int MPI_Comm_size(MPI_Comm comm, int *size);
int MPI_Comm_split(MPI_Comm comm, int color, int key, MPI_Comm *newcomm);
int MPI_Comm_free(MPI_Comm *comm);
int MPI_Barrier(MPI_Comm comm);
int MPI_Bcast(void *buffer, int count, MPI_Datatype dt, int root, MPI_Comm comm);
int MPI_Scatter(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                void *recvbuf, int recvcount, MPI_Datatype recvtype, int root, MPI_Comm comm);
int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest, int tag, MPI_Comm comm);
int MPI_Bsend(const void *buf, int count, MPI_Datatype dt, int dest, int tag, MPI_Comm comm);
int MPI_Recv(void *buf, int count, MPI_Datatype dt, int source, int tag, MPI_Comm comm, MPI_Status *status);
int MPI_Irecv(void *buf, int count, MPI_Datatype dt, int source, int tag, MPI_Comm comm, MPI_Request *request);
int MPI_Wait(MPI_Request *request, MPI_Status *status);
int MPI_Probe(int source, int tag, MPI_Comm comm, MPI_Status *status);
int MPI_Iprobe(int source, int tag, MPI_Comm comm, int *flag, MPI_Status *status);
int MPI_Get_count(const MPI_Status *status, MPI_Datatype dt, int *count);
int MPI_Buffer_attach(void *buffer, int size);
int MPI_Buffer_detach(void *buffer, int *size);

#ifdef __cplusplus
}
#endif
#endif
